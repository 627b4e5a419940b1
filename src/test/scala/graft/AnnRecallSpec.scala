package graft

import graft.io.Tables
import graft.sim.Similarity

/** Quantitative correctness signal for the two rows-only ANN variants:
  * recall@5 against the exact brute-force top-k on real sf0.01 data.
  * Both are approximate by construction (recall < 1 is expected); the
  * floor pins the quality so a regression in the LSH tables or the IVF
  * quantizer shows up as a test failure, not a silent recall drop.
  */
class AnnRecallSpec extends SparkSuite {

  private lazy val t = {
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, "/root/testdata/sf0.01")
  }

  /** probe -> set of top-5 neighbor ids */
  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }

  private lazy val truth = neighbors(Similarity.annBruteForce(t))

  /** Micro-averaged recall@5: found true neighbors / all true neighbors. */
  private def recallAt5(approx: Map[Long, Set[Long]]): Double = {
    val hit = truth.iterator.map { case (p, tr) =>
      (tr & approx.getOrElse(p, Set.empty)).size
    }.sum
    hit.toDouble / truth.valuesIterator.map(_.size).sum
  }

  test("ann_lsh recall@5 vs brute force >= 0.8 on sf0.01") {
    val r = recallAt5(neighbors(Similarity.annLsh(t)))
    info(f"ann_lsh recall@5 = $r%.3f")
    assert(r >= 0.8, f"ann_lsh recall@5 $r%.3f below 0.8 floor")
  }

  test("ann_ivf recall@5 vs brute force >= 0.8 on sf0.01") {
    val r = recallAt5(neighbors(Similarity.annIvf(t)))
    info(f"ann_ivf recall@5 = $r%.3f")
    assert(r >= 0.8, f"ann_ivf recall@5 $r%.3f below 0.8 floor")
  }
}
