package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Pins graft_top_cells to the crossJoin(broadcast)+row_number window
  * form it replaced: same (cdist asc, cell asc) rule, same left-fold
  * dot arithmetic, so the assigned cell SETS must be identical —
  * including on exact distance ties (duplicated centroids).
  */
class TopCellsSpec extends SparkSuite {

  private def windowAssign(vecs: Seq[(Long, Seq[Double])],
      cents: Seq[Seq[Double]], a: Int): Map[Long, Set[Int]] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val e = vecs.toDF("vec_id", "v")
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
    val dot = (x: String, y: String) => expr(s"graft_dot($x, $y)")
    val w = Window.partitionBy($"vec_id").orderBy($"cdist".asc, $"cell".asc)
    e.crossJoin(broadcast(cdf))
      .withColumn("cdist", dot("centroid", "centroid") - lit(2.0) * dot("v", "centroid"))
      .withColumn("cr", row_number().over(w))
      .filter($"cr" <= a)
      .select($"vec_id", $"cell")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getInt(1)).toSet }
  }

  private def exprAssign(vecs: Seq[(Long, Seq[Double])],
      cents: Seq[Seq[Double]], a: Int): Map[Long, Set[Int]] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    vecs.toDF("vec_id", "v")
      .select($"vec_id", explode(GraftFunctions.topCells($"v", cents, a)).as("cell"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getInt(1)).toSet }
  }

  test("random vectors: expression set-equals the window form at a=1,3,8") {
    withLogLevel {
      val rng = new scala.util.Random(23)
      val cents = Seq.fill(37)(Seq.fill(16)(rng.nextDouble() * 2 - 1))
      val vecs = (0L until 200L).map(i => (i, Seq.fill(16)(rng.nextDouble() * 2 - 1)))
      for (a <- Seq(1, 3, 8))
        assert(exprAssign(vecs, cents, a) == windowAssign(vecs, cents, a), s"a=$a")
    }
  }

  test("exact ties (duplicated centroids) break cell-ascending like the window") {
    withLogLevel {
      val rng = new scala.util.Random(29)
      val base = Seq.fill(6)(Seq.fill(8)(rng.nextDouble()))
      // every centroid duplicated: each distance appears exactly twice,
      // so a=3 always cuts through a tie boundary somewhere
      val cents = base ++ base
      val vecs = (0L until 50L).map(i => (i, Seq.fill(8)(rng.nextDouble())))
      for (a <- Seq(1, 2, 3, 5))
        assert(exprAssign(vecs, cents, a) == windowAssign(vecs, cents, a), s"a=$a")
    }
  }

  test("a >= nlist returns all cells; rank order is (cdist asc, cell asc)") {
    withLogLevel {
      import spark.implicits._
      GraftFunctions.register(spark)
      val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0))
      val got = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "v")
        .select(GraftFunctions.topCells($"v", cents, 10).as("cs"))
        .head.getSeq[Int](0)
      // cells 0 and 2 tie at the minimum distance: 0 before 2, then 1
      assert(got == Seq(0, 2, 1))
    }
  }
}
