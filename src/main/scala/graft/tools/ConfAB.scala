package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off r21 instrument: full-sweep A/B of dynamic SQL configs
  * (join strategy preference, AQE sizing) against the default Bench
  * session. Each labeled config set runs one full timed sweep (same
  * cache hygiene as Bench); compare totals and per-query outliers.
  *
  * Usage: ConfAB <sfDir>
  */
object ConfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.tools.Quiet.windowWarn()
    val queries = graft.SparkEntry.queries.toSeq
    // warmup at sf0.001 like Bench
    val warmDir = new java.io.File("/root/testdata/sf0.001")
    if (warmDir.isDirectory)
      queries.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count() catch { case _: Throwable => }
      }
    def sweep(): Map[String, Double] = {
      graft.tools.SweepCaches.releaseAll()
      val caches = new graft.tools.SweepCaches.Tracker
      queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        caches.done(name)
        name -> dt
      }.toMap
    }
    val shj = Map(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "64MB")
    // interleaved, first (JIT-warming) sweep discarded; best-of-2 per
    // config so a transient spike doesn't decide the comparison
    val plan: Seq[(String, Map[String, String])] = Seq(
      "warm" -> Map(), "default" -> Map(), "shj+aqeshj" -> shj,
      "default" -> Map(), "shj+aqeshj" -> shj)
    val acc = scala.collection.mutable.Map
      .empty[String, List[Map[String, Double]]].withDefaultValue(Nil)
    plan.foreach { case (label, cfg) =>
      Seq("spark.sql.join.preferSortMergeJoin",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
        .foreach(spark.conf.unset)
      cfg.foreach { case (k, v) => spark.conf.set(k, v) }
      val r = sweep()
      println(f"CONFAB sweep $label%-12s total=${r.values.sum}%8.2f s")
      if (label != "warm") acc(label) ::= r
    }
    val best: Map[String, Map[String, Double]] = acc.toMap.map { case (l, rs) =>
      l -> rs.flatMap(_.keys).distinct.map(k => k -> rs.map(_(k)).min).toMap
    }
    val a = best("default"); val b = best("shj+aqeshj")
    println(f"CONFAB best-of-2 default=${a.values.sum}%8.2f shj+aqeshj=${b.values.sum}%8.2f")
    val moved = a.keys.toSeq.map(k => (k, a(k), b(k) - a(k))).sortBy(_._3)
    (moved.take(10) ++ moved.takeRight(10)).foreach { case (k, v, d) =>
      println(f"  $k%-28s $v%7.3f -> ${v + d}%7.3f  (${d}%+.3f)")
    }
    spark.stop()
  }
}
