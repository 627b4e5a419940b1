package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class FunctionsSpec extends SparkSuite {

  test("graft_dot is bitwise-equal to the aggregate/zip_with fold") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val rng = new scala.util.Random(7)
      val rows = Seq.fill(50)((
        Array.fill(64)(rng.nextDouble() * 2 - 1),
        Array.fill(64)(rng.nextDouble() * 2 - 1)))
      val df = rows.toDF("a", "b")
      val got = df.select(
        expr("graft_dot(a, b)").as("native"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("hof")
      ).collect()
      got.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
      }
    }
  }

  // GraftExtensions is exercised end-to-end by graft.tools.ExtDemo (a
  // fresh JVM builds the session with spark.sql.extensions); inside this
  // shared-session test JVM getOrCreate would silently ignore extensions.

  test("graft_dot handles nulls and length mismatch") {
    import spark.implicits._
    withLogLevel {
      GraftFunctions.register(spark)
      val df = Seq(
        (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0, 9.0))), // min-length semantics
        (None, Some(Array(1.0)))
      ).toDF("a", "b")
      val got = df.select(expr("graft_dot(a, b)")).collect()
      assert(got(0).getDouble(0) == 11.0)
      assert(got(1).isNullAt(0))
    }
  }
}
