package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.Tables

/** Prints the FINAL adaptive (post-AQE) physical plan of the queries
  * whose join strategy is intentionally left to AQE — the static plan
  * from `Plans` shows what the optimizer guessed; this shows what AQE
  * actually ran, which is the evidence that un-hinted joins still end
  * up broadcast while their build side is genuinely small.
  */
object AdaptivePlans {
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
    val t = Tables(spark, sfDir)
    val interesting: Seq[(String, DataFrame)] = Seq(
      "q9_star_join" -> graft.ops.Relational.q9StarJoin(t),
      "corpus_curated" -> graft.pipeline.CorpusOps.curated(t),
      "dedup_ngram_jaccard" -> graft.dedup.Dedup.ngramJaccard(t),
      "text_tfidf" -> graft.text.TextAnalysis.tfidf(t),
      // round 4: de-hinted corpus-fraction probe sets — evidence AQE
      // still broadcasts them at local scale (and could demote at 100x)
      "q32_fuzzy_name" -> graft.ops.Relational.q32FuzzyName(t),
      "ann_brute_force" -> graft.sim.Similarity.annBruteForce(t),
      "corpus_budget_sample" -> graft.pipeline.CorpusOps.budgetSample(t),
      // round 15: the un-hinted candidate joins of the new dedup/ANN ops
      "dedup_edit_distance" -> graft.dedup.Dedup.editDistance(t, checkpoint = false),
      "ann_label_filtered" -> graft.sim.Similarity.annLabelFiltered(t))
    interesting.foreach { case (name, df) =>
      df.count() // materialize so AQE finalizes every stage
      println(s"===== $name (final adaptive plan) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
