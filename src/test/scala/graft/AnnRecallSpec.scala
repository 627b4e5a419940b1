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

  test("ann_hamming recall@5 vs brute force on sf0.01") {
    // 1-bit sign words are the crudest sketch in the family: rerank=64
    // measured 0.728 (sign bits of raw dims lose more than fitted
    // centroids), so the default shortlist is 128 wide — measured
    // 0.928, and the extra 64 rows per probe are noise next to the
    // popcount scan. Same 0.8 floor as the IVF family.
    val r = recallAt5(neighbors(Similarity.annHamming(t)))
    info(f"ann_hamming recall@5 = $r%.3f")
    assert(r >= 0.8, f"ann_hamming recall@5 $r%.3f below 0.8 floor")
  }

  test("ann_cascade recall@5 vs brute force on sf0.01") {
    // 256-wide 1-bit shortlist → 32-wide int8 re-rank → exact top-5.
    // The binary stage bounds the funnel's recall (ann_hamming's 128
    // shortlist measures 0.928); doubling the shortlist buys the slack
    // the int8 middle stage spends (QuantizeSpec's 0.99 recall), so
    // the cascade holds the same 0.8 floor while reading 4x fewer
    // float rows than ann_hamming's direct re-rank.
    val r = recallAt5(neighbors(Similarity.annCascade(t)))
    info(f"ann_cascade recall@5 = $r%.3f")
    assert(r >= 0.8, f"ann_cascade recall@5 $r%.3f below 0.8 floor")
  }

  test("dedup_semantic co-clusters the baseline near-dup pairs on sf0.01") {
    // every label-blocked pair at the semantic threshold must share a
    // representative (transitive closure can only merge more); reps
    // must be valid component-mins (rep <= member, rep maps to itself)
    val sem = Similarity.semanticDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val base = Similarity.embeddingNearDup(t).collect()
      .filter(_.getAs[Double]("cos") >= 0.35)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(base.nonEmpty)
    val hit = base.count { case (a, b) => sem(a) == sem(b) }
    val recall = hit.toDouble / base.length
    info(f"dedup_semantic co-clustering recall = $recall%.3f (${base.length} baseline pairs)")
    assert(recall >= 0.9, f"co-clustering recall $recall%.3f below 0.9 floor")
    sem.foreach { case (v, rep) =>
      assert(rep <= v, s"rep $rep is not the component min for $v")
      assert(sem(rep) == rep, s"rep $rep does not map to itself")
    }
    assert(sem.values.toSet.size < sem.size, "expected a real cluster structure")
  }

  test("dedup_embedding_ivf pair recall vs the label-blocked baseline on sf0.01") {
    // The oracle-green baseline (embeddingNearDup) finds all
    // same-label pairs with cos >= 0.3; the IVF-cell-blocked variant
    // must rediscover most of them with geometric blocking alone —
    // pinning the quantizer's quality as pair recall, the same way the
    // ANN floors pin recall@5. It may legitimately find MORE pairs
    // (cross-label near-dups the label baseline cannot see).
    val base = Similarity.embeddingNearDup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.embeddingNearDupIvf(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base.nonEmpty)
    val recall = (base & ivf).size.toDouble / base.size
    info(f"dedup_embedding_ivf pair recall = $recall%.3f (${ivf.size} pairs vs ${base.size} baseline)")
    assert(recall >= 0.9, f"pair recall $recall%.3f below 0.9 floor")
  }

  test("ann_range_ivf pair recall vs exact range search >= 0.8; cosines genuine") {
    val exact = Similarity.annRange(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pruned = Similarity.annRangeIvf(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "exact range result empty — fixture degenerate")
    val recall = pruned.keySet.intersect(exact.keySet).size.toDouble / exact.size
    info(f"ann_range_ivf pair recall = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.8, f"range pair recall $recall%.3f below 0.8 floor")
    // cell pruning must only PRUNE: every reported pair is in the exact
    // set with the identical cosine (bitwise — same arithmetic)
    pruned.foreach { case (k, c) =>
      assert(exact.get(k).contains(c), s"pair $k not exact or cosine differs")
    }
  }

  test("ann_mrl funnel: genuine cosines, exact re-rank consistent with brute force") {
    val mrl = Similarity.annMrl(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // every reported cosine must equal the exact pairwise cosine the
    // brute-force path computes (the funnel only prunes, never scores
    // approximately at the final stage)
    val bf = Similarity.annBruteForce(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val overlap = mrl.keySet.intersect(bf.keySet)
    assert(overlap.nonEmpty)
    overlap.foreach { k => assert(mrl(k) == bf(k), s"cosine mismatch at $k") }
    val recall = overlap.size.toDouble / bf.size
    info(f"ann_mrl recall@5 = $recall%.3f (worst-case random embeddings)")
    assert(recall >= 0.6, f"recall $recall%.3f below the shortlist-128 floor")
  }

  test("ann_ivf reported cosines are genuine and ranks consistent (independent recompute)") {
    // ann_ivf has no SQL oracle (the KMeans quantizer isn't
    // SQL-expressible), so verify the value-level guarantee here with
    // an implementation that shares nothing with the query path: plain
    // Scala sequential double fold over the raw vectors (the same
    // accumulation order graft_dot and DuckDB's list_dot_product use).
    val vecs: Map[Long, Array[Double]] = t.embeddings
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def fold(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val rows = Similarity.annIvf(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c, cos) = (r.getLong(0), r.getLong(1), r.getDouble(3))
      val expect = fold(vecs(p), vecs(c)) /
        (math.sqrt(fold(vecs(p), vecs(p))) * math.sqrt(fold(vecs(c), vecs(c))))
      assert(java.lang.Double.doubleToLongBits(cos) ==
        java.lang.Double.doubleToLongBits(expect),
        s"probe $p cand $c: reported $cos != recomputed $expect")
    }
    // ranks: contiguous from 1 per probe, ordered by (cos desc, cand asc)
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val byRank = rs.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq == (1 to rs.length),
        s"probe $p ranks not contiguous")
      val ordered = byRank.map(r => (-r.getDouble(3), r.getLong(1))).toSeq
      assert(ordered == ordered.sorted, s"probe $p rank order inconsistent")
    }
  }

  test("ann_recall_probe: fresh index clears the floor, mis-mapped index fires refit") {
    val fresh = Similarity.annRecallProbe(t).collect()
    assert(fresh.length == 64, s"${fresh.length} probes != 64")
    val recall = fresh.head.getDouble(3)
    info(f"fresh-index probe recall = $recall%.3f")
    // the recall column is the micro-average of the per-probe rows
    val recomputed = fresh.map(_.getInt(1)).sum.toDouble / fresh.map(_.getInt(2)).sum
    assert(recall == recomputed)
    assert(recall >= 0.8 && fresh.forall(_.getInt(4) == 0),
      f"no-drift case must not flag a refit (recall $recall%.3f)")
    // a stale index — resident assignments no longer matching the
    // centroid table the probe ranks against — must fire the flag
    val (idx, cents) = Similarity.quantizedCellIndex(t)
    val rotated = cents.map { case (cell, c) => ((cell + 1) % cents.size, c) }
      .sortBy(_._1)
    val stale = Similarity.annRecallProbe(t, index = Some((idx, rotated))).collect()
    info(f"stale-index probe recall = ${stale.head.getDouble(3)}%.3f")
    assert(stale.head.getDouble(3) < recall)
    assert(stale.forall(_.getInt(4) == 1), "stale index must flag refit")
  }
}
