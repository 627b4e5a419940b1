package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Scratch profiler: times sub-stages of the heavy pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()

    val shingles = t.documents
      .select($"doc_id", explode(expr(
        "transform(sequence(1, greatest(length(text)-4, 1)), i -> substring(text, i, 5))"
      )).as("shingle"))
    time("shingles-explode")(shingles.count())
    time("shingles-distinct")(shingles.distinct().count())
    val hashed = shingles.distinct().select($"doc_id",
      conv(substring(md5($"shingle".cast("binary")), 1, 8), 16, 10).cast("long").as("h"))
    time("shingles-md5")(hashed.count())
    val aggs = graft.dedup.Dedup.AB.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % graft.dedup.Dedup.P).as(s"m$i") }
    val sig = hashed.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    time("signatures")(sig.count())
    time("minhash-full")(graft.dedup.Dedup.minhashLsh(t).count())


    val grams = t.documents
      .repartition(t.spark.sparkContext.defaultParallelism)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, greatest(size(split(text, ' '))-4, 1)), " +
          "i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
      )).as("gram"))
      .distinct()
    time("grams-distinct")(grams.count())
    val ga = grams.toDF("doc_a", "gram")
    val gb = grams.toDF("doc_b", "gram")
    time("gram-selfjoin")(ga.join(gb, ga("gram") === gb("gram") && ga("doc_a") < gb("doc_b")).count())
    // prefix-filter pipeline sub-stages (mirrors Dedup.ngramJaccard)
    val gramsP = grams.persist()
    time("ngram-grams-persist")(gramsP.count())
    val dfTab = gramsP.groupBy($"gram").agg(count(lit(1)).as("df"))
    time("ngram-df-agg")(dfTab.count())
    val prefix = gramsP.join(dfTab, "gram")
      .groupBy($"doc_id")
      .agg(collect_list(struct($"df", $"gram")).as("lst"))
      .select($"doc_id", explode(expr(
        "slice(array_sort(lst), 1, size(lst) - (size(lst) + 9) div 10 + 1)"
      )).as("e"))
      .select($"doc_id", $"e.gram".as("gram"))
    time("ngram-prefix")(prefix.count())
    time("ngram-prefix-selfjoin")(prefix.toDF("doc_a", "gram")
      .join(prefix.toDF("doc_b", "gram"), "gram")
      .filter($"doc_a" < $"doc_b").select($"doc_a", $"doc_b").distinct().count())
    gramsP.unpersist()
    time("ngram-full")(graft.dedup.Dedup.ngramJaccard(t).count())
    time("simhash-hamming-full")(graft.dedup.Dedup.simhashHamming(t).count())
    time("ann-lsh-full")(graft.sim.Similarity.annLsh(t).count())

    val e = t.embeddings.select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
    time("emb-norm")(e.withColumn("nrm",
      sqrt(aggregate(zip_with($"v", $"v", (x, y) => x * y), lit(0.0), (a, x) => a + x))).count())
    time("emb-neardup-full")(graft.sim.Similarity.embeddingNearDup(t).count())
    time("ann-brute-force")(graft.sim.Similarity.annBruteForce(t).count())
    time("ann-pq")(graft.sim.Similarity.annPq(t).count())

    // PassJoin edit-distance sub-stages — the SAME private[graft]
    // builders Dedup.editDistance runs, so the timings always profile
    // the shipped pipeline (a pasted copy would silently diverge when
    // the constants change)
    val keysE = graft.dedup.Dedup.edKeys(t.widen(t.documents)).persist()
    time("edq-keys")(keysE.count())
    val longKeys = keysE.filter($"l" >= graft.dedup.Dedup.EdBlockMinLen)
    val blocksE = graft.dedup.Dedup.edBlocks(longKeys)
    time("edq-blocks")(blocksE.count())
    val probesE = graft.dedup.Dedup.edProbes(longKeys)
    time("edq-probes")(probesE.count())
    val candE = blocksE.toDF("doc_a", "bl", "bj", "bc")
      .join(probesE.toDF("doc_b", "bl", "bj", "bc"), Seq("bl", "bj", "bc"))
      .filter($"doc_a" =!= $"doc_b")
      .select(least($"doc_a", $"doc_b").as("doc_a"),
        greatest($"doc_a", $"doc_b").as("doc_b"))
    time("edq-cand-join")(candE.count())
    time("edq-cand-distinct")(candE.distinct().count())
    keysE.unpersist()
    time("edq-full")(graft.dedup.Dedup.editDistance(t).count())
    spark.stop()
  }
}
