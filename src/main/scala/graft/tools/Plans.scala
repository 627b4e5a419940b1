package graft.tools

import org.apache.spark.sql.SparkSession

import graft.io.Tables
import graft.ops.Relational

/** Dumps formatted physical plans for plan-quality review. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)
    val interesting = Map(
      "q1_agg" -> Relational.q1Agg(t),
      "q2_regex_filter" -> Relational.q2RegexFilter(t),
      "q9_star_join" -> Relational.q9StarJoin(t),
      "q8_top_k" -> Relational.q8TopK(t),
      "asof_join" -> graft.ops.AsOf.eventsAsOfOrders(t),
      "q29_running_sum" -> Relational.q29RunningSum(t),
      "q28_theta_join" -> Relational.q28ThetaJoin(t),
      "q32_fuzzy_name" -> Relational.q32FuzzyName(t),
      // the UNCACHED plan (the memoized form analyzes to a LogicalRDD)
      "contamination" -> graft.pipeline.CorpusOps.contaminationUncached(t),
      "corpus_curated" -> graft.pipeline.CorpusOps.curated(t),
      "q36_interval_join" -> Relational.q36IntervalJoin(t),
      "q39_five_number" -> Relational.q39FiveNumber(t),
      "dedup_substring" -> graft.dedup.Dedup.substringDup(t),
      "text_tfidf" -> graft.text.TextAnalysis.tfidf(t),
      "q42_sliding_window" -> Relational.q42SlidingWindow(t),
      "q43_full_outer" -> Relational.q43FullOuter(t),
      "corpus_budget_sample" -> graft.pipeline.CorpusOps.budgetSample(t),
      "text_vocab_coverage" -> graft.text.TextAnalysis.vocabCoverage(t),
      "q47_bloom_semi" -> graft.ops.BloomJoin.q47BloomSemi(t),
      "q48_salted_join" -> Relational.q48SaltedJoin(t),
      "q49_salted_agg" -> Relational.q49SaltedAgg(t),
      "q50_heavy_hitters" -> Relational.q50HeavyHitters(t),
      "q51_heavy_hitters_sketch" -> Relational.q51HeavyHittersSketch(t),
      "corpus_mixture_interleave" -> graft.functions.Aggs.mixtureInterleaveQuery(t),
      "corpus_boilerplate" -> graft.pipeline.CorpusOps.boilerplate(t),
      "corpus_strip_boilerplate" -> graft.pipeline.CorpusOps.stripBoilerplate(t),
      "emb_quantize_int8" -> graft.sim.Similarity.embQuantizeInt8(t),
      "ann_int8" -> graft.sim.Similarity.annInt8(t),
      "ann_ivf_int8" -> graft.sim.Similarity.annIvfInt8(t),
      "ann_cascade" -> graft.sim.Similarity.annCascade(t),
      "dedup_near_kept" -> graft.dedup.Dedup.nearKeptCorpus(t),
      "corpus_ngram_novelty" -> graft.pipeline.CorpusOps.ngramNovelty(t),
      "dedup_image_ahash" -> graft.mm.Multimodal.imageNearDup(t),
      // checkpoint=false: show the real pipeline, not the collapsed
      // post-localCheckpoint ExistingRDD scan
      "dedup_edit_distance" -> graft.dedup.Dedup.editDistance(t, checkpoint = false),
      "dedup_containment" -> graft.dedup.Dedup.containment(t, checkpoint = false),
      "corpus_scrub_spans" -> graft.pipeline.CorpusOps.scrubSpans(t, checkpoint = false),
      "ann_label_filtered" -> graft.sim.Similarity.annLabelFiltered(t),
      // IVF retrieval family: the probe-cell assignment must read as a
      // Generate(explode(graft_top_cells)) narrow map — a Window/Sort
      // here is the defect-4 (N/13)·nlist vector-wide regression
      "ann_ivf" -> graft.sim.Similarity.annIvf(t, checkpoint = false),
      "ann_range_ivf" -> graft.sim.Similarity.annRangeIvf(t, checkpoint = false),
      "q52_retention" -> Relational.q52RetentionCohorts(t))
    interesting.foreach { case (name, df) =>
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
