package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.CountWindowToJoin

/** CountWindowToJoin: the whole-partition COUNT window must become an
  * aggregate + null-safe join (map-side combinable, AQE-splittable)
  * with bit-identical results, and the guards must leave every other
  * window shape alone. Activated session-locally via
  * spark.experimental.extraOptimizations (the config-only path is
  * GraftExtensions — exercised by tools.ExtDemo in a fresh JVM, since
  * getOrCreate ignores withExtensions on an existing session).
  */
class PlanRewriteSpec extends SparkSuite {

  private def fixture: DataFrame = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"),
      (null, "x"), (null, "y") // NULL partition key: one window partition
    ).toDF("k", "v")
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(CountWindowToJoin)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("whole-partition count window rewrites to agg+join, results bit-identical") {
    val q = (df: DataFrame) => df
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("k"))))
      .select("k", "v", "c")
    val expected = q(fixture).collect().map(r =>
      (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    withRule {
      val df = q(fixture)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Window"), s"Window survived the rewrite:\n$opt")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("WindowExec"), s"WindowExec survived:\n$phys")
      // the aggregate form partial-combines before its exchange
      assert(phys.contains("partial_count") || phys.contains("HashAggregate"),
        s"no partial aggregation in:\n$phys")
      val got = df.collect().map(r =>
        (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
      assert(got == expected) // incl. the two NULL-key rows counting as 2
      assert(got.exists { case (k, _, c) => k.isEmpty && c == 2L },
        "null keys must form one group via the null-safe join")
    }
  }

  test("count(col) keeps non-null semantics through the rewrite") {
    import spark.implicits._
    val df0 = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", null), ("a", 3L), ("b", null)
    ).toDF("k", "x")
    val q = (df: DataFrame) => df
      .withColumn("c", count(col("x")).over(Window.partitionBy(col("k"))))
    val expected = q(df0).collect().map(r =>
      (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
    withRule {
      val df = q(df0)
      assert(!df.queryExecution.optimizedPlan.toString.contains("Window"))
      val got = df.collect().map(r =>
        (r.getString(0), Option(r.get(1)), r.getLong(2))).toSet
      assert(got == expected)
      assert(got.collect { case ("a", _, c) => c }.forall(_ == 2L)) // nulls uncounted
    }
  }

  test("guards: ordered, grand-total, and non-count windows are untouched") {
    withRule {
      val ordered = fixture.withColumn("r",
        count(lit(1)).over(Window.partitionBy(col("k")).orderBy(col("v"))))
      assert(ordered.queryExecution.optimizedPlan.toString.contains("Window"),
        "ORDER BY window must not rewrite (running count semantics)")
      val grand = fixture.withColumn("c", count(lit(1)).over(Window.partitionBy()))
      assert(grand.queryExecution.optimizedPlan.toString.contains("Window"),
        "grand-total window is deliberately kept (documented pattern)")
      val listed = fixture.withColumn("l",
        collect_list(col("v")).over(Window.partitionBy(col("k"))))
      assert(listed.queryExecution.optimizedPlan.toString.contains("Window"),
        "order-sensitive aggregates are out of scope")
    }
  }

  test("nondeterministic children are left alone (plan-duplication hazard)") {
    withRule {
      // a Range source (not a LocalRelation, which constant-folding
      // would materialize — including the rand values — before the
      // rule runs) keeps the rand expression live in the child plan
      val df = spark.range(100)
        .withColumn("bucket", (rand(7) * 3).cast("int"))
        .withColumn("c", count(lit(1)).over(Window.partitionBy(col("bucket"))))
      assert(df.queryExecution.optimizedPlan.toString.contains("Window"),
        "rand-derived keys must not be re-evaluated on two join sides")
    }
  }

  test("sum/min/avg whole-partition windows rewrite with exact results") {
    import spark.implicits._
    val df0 = Seq(("a", 1.0), ("a", 2.5), ("b", 4.0)).toDF("k", "x")
    val q = (df: DataFrame) => df
      .withColumn("s", sum(col("x")).over(Window.partitionBy(col("k"))))
      .withColumn("m", min(col("x")).over(Window.partitionBy(col("k"))))
      .withColumn("a", avg(col("x")).over(Window.partitionBy(col("k"))))
    val expected = q(df0).collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    withRule {
      val df = q(df0)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("Window"), s"Window survived: $opt")
      val got = df.collect().map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))).toSet
      assert(got == expected)
    }
  }

  test("generated self-join subtrees carry disjoint exprIds") {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    withRule {
      // an intermediate alias BELOW the window child exercises the
      // renewal of conflicting aliases, not just leaf relations
      val df = fixture
        .select(col("k"), upper(col("v")).as("vu"))
        .withColumn("c", count(lit(1)).over(Window.partitionBy(col("k"))))
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      assert(joins.nonEmpty, "rewrite must produce a join")
      def ids(p: LogicalPlan): Set[Long] = p.collect { case n =>
        n.output.map(_.exprId.id).toSet ++
          n.expressions.flatMap(_.collect { case a: Alias => a.exprId.id })
      }.flatten.toSet
      val shared = ids(joins.head.left) & ids(joins.head.right)
      assert(shared.isEmpty,
        s"exprIds present in BOTH join subtrees (optimizer-created " +
          s"self-join must be deduplicated): $shared")
      assert(df.collect().length == fixture.count()) // still executes
    }
  }
}
