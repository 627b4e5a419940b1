package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Text-analysis operators for the training-data pipeline surface
  * (BASELINE.json north_star). Deterministic across engines: token
  * statistics are integers, ratios are single IEEE divisions, quality
  * gates are integer comparisons, fingerprints are md5.
  */
object TextAnalysis {

  /** Per-document token statistics: counts are one explode + hash-agg
    * (map-side combinable); ratios derived afterward.
    */
  def stats(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        countDistinct($"tok").as("n_distinct_words"),
        sum(length($"tok")).as("sum_len"),
        sum(when($"tok".isin("the", "a", "of", "and", "is"), 1).otherwise(0)).as("stop_cnt")
      )
      .select(
        $"doc_id", $"n_words", $"n_distinct_words",
        ($"sum_len".cast(DoubleType) / $"n_words").as("avg_word_len"),
        ($"stop_cnt".cast(DoubleType) / $"n_words").as("stop_ratio")
      )
  }

  val statsSql: String =
    """SELECT doc_id, n_words, n_distinct_words,
      | CAST(sum_len AS DOUBLE) / n_words AS avg_word_len,
      | CAST(stop_cnt AS DOUBLE) / n_words AS stop_ratio
      |FROM (SELECT doc_id, count(*) AS n_words, count(DISTINCT tok) AS n_distinct_words,
      |  sum(length(tok)) AS sum_len,
      |  sum(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS stop_cnt
      | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      | WHERE tok <> '' GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** Quality gate: three integer-arithmetic checks (length band,
    * stopword-ratio band, mean-word-length band) summed to a 0-3 score;
    * pass = score >= 2. The kind of cheap filter a 100 TB corpus gets
    * before anything expensive runs.
    */
  def quality(t: Tables): DataFrame = {
    import t.spark.implicits._
    val base = t.documents
      .select($"doc_id", $"n_chars", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id", $"n_chars")
      .agg(
        count(lit(1)).as("n_words"),
        sum(length($"tok")).as("sum_len"),
        sum(when($"tok".isin("the", "a", "of", "and", "is"), 1).otherwise(0)).as("stop_cnt")
      )
    base.select(
      $"doc_id",
      (when($"n_chars".between(100, 500), 1).otherwise(0) +
        when($"stop_cnt" * 20 >= $"n_words" && $"stop_cnt" * 2 <= $"n_words", 1).otherwise(0) +
        when($"sum_len" >= $"n_words" * 3 && $"sum_len" <= $"n_words" * 8, 1).otherwise(0)
      ).as("q_score")
    ).withColumn("q_pass", col("q_score") >= 2)
  }

  val qualitySql: String =
    """SELECT doc_id,
      | (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1 ELSE 0 END +
      |  CASE WHEN stop_cnt * 20 >= n_words AND stop_cnt * 2 <= n_words THEN 1 ELSE 0 END +
      |  CASE WHEN sum_len >= n_words * 3 AND sum_len <= n_words * 8 THEN 1 ELSE 0 END) AS q_score,
      | (CASE WHEN n_chars BETWEEN 100 AND 500 THEN 1 ELSE 0 END +
      |  CASE WHEN stop_cnt * 20 >= n_words AND stop_cnt * 2 <= n_words THEN 1 ELSE 0 END +
      |  CASE WHEN sum_len >= n_words * 3 AND sum_len <= n_words * 8 THEN 1 ELSE 0 END) >= 2 AS q_pass
      |FROM (SELECT doc_id, n_chars, count(*) AS n_words, sum(length(tok)) AS sum_len,
      |  sum(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS stop_cnt
      | FROM (SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS tok FROM documents)
      | WHERE tok <> '' GROUP BY doc_id, n_chars)""".stripMargin.replace("\n", " ")

  /** Stopword-marker language ID with a fixed precedence (en > es > fr >
    * de) on score ties — the classic cheap n-gram/marker heuristic.
    */
  def langId(t: Tables): DataFrame = {
    import t.spark.implicits._
    val markers = Map(
      "en" -> Seq("the", "a", "and", "of", "is"),
      "es" -> Seq("el", "la", "de", "y", "es"),
      "fr" -> Seq("le", "une", "et", "est", "dans"),
      "de" -> Seq("der", "die", "das", "und", "ist"))
    val scored = t.documents
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
      .groupBy($"doc_id")
      .agg(
        sum(when($"tok".isin(markers("en"): _*), 1).otherwise(0)).as("s_en"),
        sum(when($"tok".isin(markers("es"): _*), 1).otherwise(0)).as("s_es"),
        sum(when($"tok".isin(markers("fr"): _*), 1).otherwise(0)).as("s_fr"),
        sum(when($"tok".isin(markers("de"): _*), 1).otherwise(0)).as("s_de")
      )
    scored.select(
      $"doc_id",
      when($"s_en" >= $"s_es" && $"s_en" >= $"s_fr" && $"s_en" >= $"s_de", "en")
        .when($"s_es" >= $"s_fr" && $"s_es" >= $"s_de", "es")
        .when($"s_fr" >= $"s_de", "fr")
        .otherwise("de").as("pred_lang"),
      $"s_en", $"s_es", $"s_fr", $"s_de")
  }

  val langIdSql: String =
    """SELECT doc_id,
      | CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
      |  WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
      |  WHEN s_fr >= s_de THEN 'fr' ELSE 'de' END AS pred_lang,
      | s_en, s_es, s_fr, s_de
      |FROM (SELECT doc_id,
      |  CAST(sum(CASE WHEN tok IN ('the','a','and','of','is') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
      |  CAST(sum(CASE WHEN tok IN ('el','la','de','y','es') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
      |  CAST(sum(CASE WHEN tok IN ('le','une','et','est','dans') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
      |  CAST(sum(CASE WHEN tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS BIGINT) AS s_de
      | FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      | WHERE tok <> '' GROUP BY doc_id)""".stripMargin.replace("\n", " ")

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — the OpenRefine-style "fingerprint" normalization; docs that
    * are token-set permutations of each other collide.
    */
  def fingerprint(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents.select(
      $"doc_id",
      md5(array_join(
        array_sort(filter(array_distinct(split($"text", " ")), x => x =!= "")),
        " ").cast(BinaryType)).as("fp"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      | md5(array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS fp
      |FROM documents""".stripMargin.replace("\n", " ")

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * ([a-z0-9]+ maximal runs) — the usual pre-tokenizer size estimate.
    */
  def tokenCount(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents.select(
      $"doc_id",
      size(filter(split($"text", " "), x => x =!= "")).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("n_re_tokens"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      | CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_ws_tokens,
      | CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_re_tokens
      |FROM documents""".stripMargin.replace("\n", " ")

  /** Model-based quality scoring — the fastText-style classifier
    * filter every production corpus pass runs (score each document
    * with a tiny linear model over hashed features, gate on a
    * threshold; cf. the CCNet/GPT-3 quality-classifier stage). The
    * PIPELINE is the operator: feature extraction (whitespace
    * unigrams), feature hashing (md5-derived 32-bit id), a sparse
    * dot with the weight vector, and an integer admission gate. The
    * weight vector itself is a swappable model artifact — here a
    * deterministic md5-derived stand-in (w(tok) = h32(tok) % 2001 −
    * 1000, an integer in [−1000, 1000]) so the whole pass is exact
    * integer arithmetic with a FULL hash oracle; a trained model
    * drops in as a broadcast lookup without changing the plan shape.
    *
    * Zero-shuffle: the score is a per-row HOF fold over the token
    * array — no explode, no groupBy; at 100 TB this scales with
    * bytes scanned, like the other column-map text ops. (A hashed
    * WEIGHT TABLE join — the shape for weights too big for a
    * closure — would add one broadcast join; the fold form is the
    * right plan while the model fits in kilobytes.)
    */
  /** The classifier score as a pure column over a `text` column —
    * shared by the batch table ([[qualityModel]]) and the streaming
    * admission gate (Streams.qualityGate), so both paths are the same
    * expression tree bit for bit.
    */
  private[graft] def modelScore(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = filter(split(text, " "), x => x =!= "")
    aggregate(toks, lit(0L), (acc, x) =>
      acc + (graft.dedup.Dedup.h32(concat(x, lit(":qw"))) % 2001L - 1000L))
  }

  def qualityModel(t: Tables): DataFrame = {
    import t.spark.implicits._
    val toks = filter(split($"text", " "), x => x =!= "")
    t.documents.select(
      $"doc_id",
      size(toks).cast(LongType).as("n_tokens"),
      modelScore($"text").as("score"),
      when(modelScore($"text") > 0, 1)
        .otherwise(0).cast(IntegerType).as("kept"))
  }

  val qualityModelSql: String = {
    val w = s"(${graft.dedup.Dedup.sqlH32("x || ':qw'")} % 2001 - 1000)"
    s"""SELECT doc_id,
       | CAST(len(toks) AS BIGINT) AS n_tokens,
       | CAST(COALESCE(list_sum(list_transform(toks, x -> $w)), 0) AS BIGINT) AS score,
       | CAST(CASE WHEN COALESCE(list_sum(list_transform(toks, x -> $w)), 0) > 0
       |   THEN 1 ELSE 0 END AS INT) AS kept
       |FROM (SELECT doc_id,
       |  list_filter(string_split(text, ' '), x -> x <> '') AS toks
       | FROM documents)""".stripMargin.replace("\n", " ")
  }

  /** Oracle for the streaming admission gate: the admitted subset of
    * [[qualityModelSql]]'s table (score > 0), same column names.
    */
  val qualityGateSql: String = {
    val w = s"(${graft.dedup.Dedup.sqlH32("x || ':qw'")} % 2001 - 1000)"
    s"""SELECT doc_id, n_tokens, score FROM (
       | SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(list_sum(list_transform(toks, x -> $w)), 0) AS BIGINT) AS score
       | FROM (SELECT doc_id,
       |   list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents))
       |WHERE score > 0""".stripMargin.replace("\n", " ")
  }

  /** Token-level scrub — the cleaning transform of a training-data
    * pipeline (stopword removal here; the same shape drops PII tokens,
    * URLs, or blocklisted terms at 100 TB). Pure list operations on the
    * token array — no regex dialect to disagree across engines — and a
    * narrow per-row map: zero shuffle, scales with bytes scanned.
    * Emits the cleaned text plus the audit count of removed tokens.
    */
  /** Deterministic feature-hashed text embeddings (Weinberger et al.'s
    * hashing trick, signed variant): each token lands in dimension
    * h32(w) mod 64 with sign h32(w‖':s') mod 2, and the signed counts
    * accumulate per (doc, dim) — the generator that turns raw text
    * into the vectors the dedup/ANN families consume, with no trained
    * model and no RNG (both hashes are md5-derived, so the embedding
    * is reproducible from the raw corpus on any engine). Output rows
    * are the sparse nonzero cells (doc_id, dim, cnt) plus the
    * L2-normalized weight; cnt sums are exact integers, the per-doc
    * norm is one sqrt of an exact integer and each weight one IEEE
    * division — the whole table carries a FULL hash oracle.
    *
    * Shape at 100 TB: one token explode, two map-side-combinable
    * aggregations ((doc, dim) then doc), one doc-keyed join — a word
    * count in vector clothing. 64 dims is the testdata contract (it
    * feeds the same 64-dim ANN machinery); real deployments raise the
    * modulus, which changes no shape.
    */
  def embed(t: Tables): DataFrame = {
    import t.spark.implicits._
    val h = graft.dedup.Dedup.h32 _
    val tf = t.widen(t.documents)
      .select($"doc_id", explode(split($"text", " ")).as("w"))
      .filter($"w" =!= "")
      .select($"doc_id", (h($"w") % 64).as("dim"),
        when(h(concat($"w", lit(":s"))) % 2 === 0, 1L).otherwise(-1L).as("s"))
      .groupBy($"doc_id", $"dim")
      .agg(sum($"s").as("cnt"))
      .filter($"cnt" =!= 0)
    val nrm = tf.groupBy($"doc_id").agg(sum($"cnt" * $"cnt").as("ss"))
    tf.join(nrm, "doc_id")
      .select($"doc_id", $"dim", $"cnt",
        ($"cnt" / sqrt($"ss")).as("weight"))
  }

  val embedSql: String = {
    val hw = graft.dedup.Dedup.sqlH32("w")
    val hs = graft.dedup.Dedup.sqlH32("w || ':s'")
    s"""WITH tok AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |tf AS (
       | SELECT doc_id, $hw % 64 AS dim,
       |  CAST(sum(CASE WHEN $hs % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS cnt
       | FROM tok WHERE w <> '' GROUP BY doc_id, $hw % 64),
       |nz AS (SELECT doc_id, dim, cnt FROM tf WHERE cnt <> 0),
       |nrm AS (SELECT doc_id, CAST(sum(cnt * cnt) AS BIGINT) AS ss
       | FROM nz GROUP BY doc_id)
       |SELECT nz.doc_id AS doc_id, dim, cnt, cnt / sqrt(ss) AS weight
       |FROM nz JOIN nrm ON nz.doc_id = nrm.doc_id""".stripMargin.replace("\n", " ")
  }

  def scrub(t: Tables): DataFrame = {
    import t.spark.implicits._
    val toks = filter(split($"text", " "), x => x =!= "")
    val kept = filter(split($"text", " "),
      x => x =!= "" && x =!= "a" && x =!= "the")
    t.documents.select(
      $"doc_id",
      array_join(kept, " ").as("scrubbed"),
      (size(toks) - size(kept)).cast(IntegerType).as("n_removed"))
  }

  val scrubSql: String =
    """SELECT doc_id,
      | array_to_string(list_filter(string_split(text, ' '),
      |   x -> x <> '' AND x <> 'a' AND x <> 'the'), ' ') AS scrubbed,
      | CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |   - len(list_filter(string_split(text, ' '),
      |       x -> x <> '' AND x <> 'a' AND x <> 'the')) AS INT) AS n_removed
      |FROM documents""".stripMargin.replace("\n", " ")

  /** TF-IDF with a linear idf (N/df instead of log(N/df)): log is not
    * correctly-rounded-guaranteed across libms, so the oracle-safe form
    * keeps the arithmetic to exact integers and one division. Shape is
    * the real one: tf per (doc, term) from one explode+agg, df per term
    * from a partial/final agg over the tf table joined back on term,
    * N broadcast as a scalar. df is NOT a window over term: a window
    * has no map-side combine, and a ubiquitous term ("the") would pin
    * its entire posting list in one partition at 100 TB. The groupBy
    * pre-aggregates each term to one row per map partition, so the
    * shuffle carries term cardinality, not the posting lists, and the
    * df table AQE-broadcasts back onto tf.
    */
  def tfidf(t: Tables): DataFrame = {
    import t.spark.implicits._
    val n = t.documents.count() // tiny scalar; at scale this is a cheap count job
    val tf = t.widen(t.documents)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .filter($"term" =!= "")
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .select($"doc_id", $"term", $"tf", $"df",
        (($"tf" * lit(n)).cast(DoubleType) / $"df").as("score"))
  }

  val tfidfSql: String =
    """SELECT doc_id, term, tf, df,
      | CAST(tf * (SELECT count(*) FROM documents) AS DOUBLE) / df AS score
      |FROM (
      | SELECT doc_id, term, tf, count(*) OVER (PARTITION BY term) AS df FROM (
      |  SELECT doc_id, term, count(*) AS tf FROM
      |   (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE term <> '' GROUP BY doc_id, term))""".stripMargin.replace("\n", " ")

  /** Top-K-vocabulary coverage — the common-word-ratio quality signal
    * LM pipelines use (a doc whose tokens rarely land in the corpus's
    * head vocabulary is boilerplate, code, or another language). Vocab
    * = the K most frequent tokens globally with a total (count desc,
    * token asc) tiebreak; per doc, coverage = in-vocab occurrences /
    * total occurrences — one integer division. Shape at 100 TB: one
    * map-side-combinable token count, a top-K (per-partition heaps,
    * no global sort), and a semi-join of the token stream against a
    * BY-CONSTRUCTION K-row vocab (AQE broadcasts it — bounded, so a
    * hint would also be legal here; left to AQE for uniformity).
    * K=10 because the synthetic corpus has ~31 distinct tokens; real
    * corpora use K=10^4-10^5 — same plan, still bounded.
    */
  private val VocabK = 10

  def vocabCoverage(t: Tables): DataFrame = {
    import t.spark.implicits._
    val toks = t.documents
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok".asc)
      .limit(VocabK)
      .select($"tok")
    val iv = toks.join(vocab, Seq("tok"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("iv_cnt"))
    // left join + coalesce: a doc with zero in-vocab tokens still reports
    toks.groupBy($"doc_id").agg(count(lit(1)).as("n_toks"))
      .join(iv, Seq("doc_id"), "left_outer")
      .select($"doc_id", $"n_toks",
        coalesce($"iv_cnt", lit(0L)).as("in_vocab"),
        (coalesce($"iv_cnt", lit(0L)).cast(DoubleType) / $"n_toks").as("coverage"))
  }

  val vocabCoverageSql: String =
    s"""WITH toks AS (
       | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
       |vocab AS (SELECT tok FROM (
       | SELECT tok, count(*) AS cnt FROM tk GROUP BY tok
       | ORDER BY cnt DESC, tok ASC LIMIT $VocabK)),
       |iv AS (SELECT doc_id, count(*) AS iv_cnt FROM tk
       | WHERE tok IN (SELECT tok FROM vocab) GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_toks FROM tk GROUP BY doc_id)
       |SELECT tot.doc_id AS doc_id, n_toks,
       | coalesce(iv_cnt, 0) AS in_vocab,
       | CAST(coalesce(iv_cnt, 0) AS DOUBLE) / n_toks AS coverage
       |FROM tot LEFT JOIN iv ON iv.doc_id = tot.doc_id""".stripMargin.replace("\n", " ")

  /** Presentation-edge formatting used by reference-parity goldens
    * (Sdemo1reduce.py:29-31 emits "{:.2f}%"). Kept out of operator
    * output schemas: Java and C printf disagree on midpoint rounding.
    */
  def percent(ratio: Double): String = f"${ratio * 100}%.2f%%"
}
