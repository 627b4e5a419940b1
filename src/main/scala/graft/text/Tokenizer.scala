package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Tokenizer-aware token accounting — the real token-budget currency of
  * a 100 TB training-data pipeline, where the whitespace/regex word
  * proxies ([[TextAnalysis.tokenCount]]) systematically under-count:
  * an LLM's BPE tokenizer splits rare words into several subword
  * pieces, so budget arithmetic done in "words" buys fewer model
  * tokens than it claims.
  *
  * The tokenizer here is a fixed-vocabulary greedy longest-match
  * subword segmenter (WordPiece-style inference): the BPE merge table
  * is represented by its closed piece vocabulary ([[pieces2]] /
  * [[pieces3]] / [[pieces4]], plus every single character as the
  * implicit base alphabet), and a word is segmented left-to-right by
  * always taking the longest vocabulary piece that prefixes the
  * remainder. Deterministic by construction: the vocabulary is a
  * compile-time constant, matching is set membership (no tie-break
  * order), and every position falls back to a 1-char token, so
  * segmentation always terminates with pos = len + 1 exactly.
  *
  * Scale shape (see SCALING.md): the whole query is ROW-LOCAL — one
  * projection over the documents scan, zero shuffles, zero joins. The
  * piece vocabulary ships as plan literals inside the fold expression,
  * which at this vocab size (~100 pieces) is strictly better than a
  * broadcast-dim join: every task gets the table for free with no
  * build side at all. (A production 50k-piece vocab would graduate to
  * a broadcast trie; the accounting query shape — fold per word, sum
  * per doc — is unchanged.) Cost is O(word length) set probes per
  * word, so throughput scales with bytes scanned, the same budget as
  * the parquet decode it rides on.
  *
  * Oracle symmetry: the DuckDB replay ([[bpeTokenCountSql]]) is a
  * recursive CTE that advances one token per iteration with a
  * CASE/IN longest-match — and its IN-lists are GENERATED from the
  * same Scala piece constants, so the two engines cannot drift.
  * Recursion depth is bounded by [[MaxWordChars]] (words are capped
  * symmetrically on both sides, invariant-6 style).
  *
  * Reference scope: the reference engine has no tokenizer (its text
  * surface is word-count style queries, e.g. demo scripts
  * maple_demo.py / juice_demo.py); this operator is part of the
  * beyond-reference LLM-pipeline surface the brief asks for.
  */
object Tokenizer {

  /** Symmetric word-length cap: bounds the Spark fold's sequence and
    * the oracle's recursion depth. Corpus words are <= 8 chars; real
    * text rarely exceeds it either, and a capped word still counts
    * every surviving character.
    */
  val MaxWordChars = 16

  /** Closed piece vocabulary by length — frequent English bigrams,
    * trigrams and 4-grams (the shape a small BPE merge table closes
    * to). Single characters are the implicit base alphabet.
    */
  val pieces2: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur")

  val pieces3: Seq[String] = Seq(
    "the", "ing", "and", "ion", "tio", "ent", "ati", "for", "her",
    "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver",
    "all", "ons", "nce", "men", "ith", "ted", "ers", "pro", "thi",
    "wit", "are", "ess", "not", "ive", "was", "ect", "rea", "com",
    "eve", "per", "int", "est", "sta", "cti", "ica", "ist", "ear",
    "ain", "one", "our", "iti", "rat")

  val pieces4: Seq[String] = Seq(
    "tion", "atio", "that", "ther", "with", "ment", "ions", "this",
    "here", "ould", "ting", "hich", "ence", "have", "ical", "they",
    "inte", "ough", "were", "ight", "sion", "ever", "ance", "able",
    "ress")

  // Vocabulary integrity: wrong-length or duplicated pieces would
  // silently skew the longest-match (a 3-char string in pieces4 can
  // never match and a duplicate changes nothing but lies about size).
  require(pieces2.forall(p => p.length == 2 && p.forall(c => c.isLower || c.isDigit)))
  require(pieces3.forall(p => p.length == 3 && p.forall(c => c.isLower || c.isDigit)))
  require(pieces4.forall(p => p.length == 4 && p.forall(c => c.isLower || c.isDigit)))
  require((pieces2 ++ pieces3 ++ pieces4).distinct.size ==
    pieces2.size + pieces3.size + pieces4.size)

  /** Longest piece length matching at 1-based position `i` of `w`.
    * substr past the end returns a short string, which cannot equal a
    * full-length piece, so no bounds checks are needed: a match of
    * length L proves L chars remain, and pos lands on len+1 exactly.
    */
  private def matchLen(w: Column, i: Column): Column =
    when(w.substr(i, lit(4)).isin(pieces4: _*), lit(4))
      .when(w.substr(i, lit(3)).isin(pieces3: _*), lit(3))
      .when(w.substr(i, lit(2)).isin(pieces2: _*), lit(2))
      .otherwise(lit(1))

  /** Token count of one capped word: a positional fold. The sequence
    * visits every char position; positions inside an already-consumed
    * piece pass the accumulator through, token starts advance `nxt`
    * by the matched piece length and bump the count.
    */
  private def tokensOf(w: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(lit(1).as("nxt"), lit(0).as("ntok")),
      (acc, i) =>
        when(i < acc.getField("nxt"), acc)
          .otherwise(struct(
            (i + matchLen(w, i)).as("nxt"),
            (acc.getField("ntok") + lit(1)).as("ntok"))),
      acc => acc.getField("ntok"))

  /** Per-document subword token accounting: word count, subword token
    * count under the fixed vocabulary, and fertility (tokens per
    * word — the under-count factor of a word-based budget). Fertility
    * is a single IEEE division of exactly-representable integers
    * (invariant 3).
    */
  def bpeTokenCount(t: Tables): DataFrame = {
    import t.spark.implicits._
    val words = expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
    val capped = transform(words, w => w.substr(lit(1), lit(MaxWordChars)))
    t.widen(t.documents)
      .select(
        $"doc_id",
        size(words).cast(IntegerType).as("n_words"),
        aggregate(transform(capped, tokensOf(_)), lit(0L),
          (a, x) => a + x.cast(LongType)).as("n_tokens"))
      .select(
        $"doc_id", $"n_words", $"n_tokens",
        when($"n_words" === 0, lit(null).cast(DoubleType))
          .otherwise($"n_tokens".cast(DoubleType) / $"n_words")
          .as("fertility"))
  }

  /** Per-source token-budget accounting in the SUBWORD currency — the
    * follow-through on why this tokenizer exists: the word-proxy
    * budget ([[graft.pipeline.CorpusOps.tokenBudget]]) under-counts
    * by each source's fertility, so a mixture weighted in words buys
    * fewer model tokens from high-fertility sources than it claims.
    * Emits, per source: doc count, word-proxy total, subword total,
    * the source's share of the corpus subword budget, and the
    * under-count factor (subword/word — exactly what a budget stated
    * in words must be multiplied by).
    *
    * Shape: the row-local fold, then ONE map-side-combinable
    * groupBy(source) — group cardinality = number of sources, so the
    * grand-total share window runs over already-aggregated rows (the
    * sanctioned grand-total-window shape, input is group-cardinality).
    * share and undercount are single IEEE divisions of
    * exactly-representable longs (invariant 3; corpus token totals
    * stay under 2^53 even at 100 TB ≈ 25T tokens).
    */
  def bpeBudget(t: Tables): DataFrame = {
    import t.spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val words = expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
    val capped = transform(words, w => w.substr(lit(1), lit(MaxWordChars)))
    t.widen(t.documents)
      .select(
        $"source",
        size(words).as("nw_doc"),
        aggregate(transform(capped, tokensOf(_)), lit(0L),
          (a, x) => a + x.cast(LongType)).as("nt_doc"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"nw_doc").as("n_words"),
        sum($"nt_doc").as("n_bpe_tokens"))
      .select(
        $"source", $"n_docs", $"n_words", $"n_bpe_tokens",
        ($"n_bpe_tokens".cast(DoubleType) /
          sum($"n_bpe_tokens").over(Window.partitionBy()).cast(DoubleType))
          .as("share"),
        when($"n_words" === 0, lit(null).cast(DoubleType))
          .otherwise($"n_bpe_tokens".cast(DoubleType) / $"n_words")
          .as("undercount"))
  }

  private def inList(ps: Seq[String]): String =
    ps.map(p => s"'$p'").mkString(", ")

  /** Shared oracle fragment: recursive segmentation CTEs ending in
    * `perdoc(doc_id, nw, nt)` — word and subword-token counts per doc.
    * One token per iteration, CASE/IN longest-match generated from the
    * same piece constants as the Spark fold. Every consumer query
    * prefixes this with WITH RECURSIVE.
    */
  private val perDocCte: String =
    s"""wi AS (
       | SELECT doc_id, substr(x, 1, $MaxWordChars) AS word,
       |  row_number() OVER () AS wid
       | FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS x
       |       FROM documents)
       |), seg AS (
       | SELECT wid, doc_id, word, 1 AS pos, 0 AS ntok FROM wi
       | UNION ALL
       | SELECT wid, doc_id, word,
       |  pos + CASE WHEN substr(word, pos, 4) IN (${inList(pieces4)}) THEN 4
       |             WHEN substr(word, pos, 3) IN (${inList(pieces3)}) THEN 3
       |             WHEN substr(word, pos, 2) IN (${inList(pieces2)}) THEN 2
       |             ELSE 1 END,
       |  ntok + 1
       | FROM seg WHERE pos <= length(word)
       |), fin AS (
       | SELECT doc_id, ntok FROM seg WHERE pos > length(word)
       |), perdoc AS (
       | SELECT doc_id, count(*) AS nw, sum(ntok) AS nt FROM fin GROUP BY doc_id
       |)""".stripMargin

  /** DuckDB replay of [[bpeTokenCount]]. DuckDB sum(INTEGER) is
    * HUGEINT → cast to BIGINT (invariant 12).
    *
    * NULL-text mirror: Spark's `size(regexp_extract_all(NULL))` is
    * NULL, so a NULL-text doc yields (NULL, NULL, NULL) — the LEFT
    * JOIN + coalesce path here would say (0, 0, NULL) for the same
    * doc because `unnest(NULL)` produces no wi rows, exactly like an
    * empty text. The CASE on `d.text IS NULL` restores the asymmetry:
    * coalesce-to-0 is only the empty-text (no word matches) case.
    */
  val bpeTokenCountSql: String =
    s"""WITH RECURSIVE $perDocCte
       |SELECT d.doc_id,
       | CAST(CASE WHEN d.text IS NULL THEN NULL
       |           ELSE coalesce(p.nw, 0) END AS INT) AS n_words,
       | CAST(CASE WHEN d.text IS NULL THEN NULL
       |           ELSE coalesce(p.nt, 0) END AS BIGINT) AS n_tokens,
       | CASE WHEN p.nw IS NULL THEN NULL
       |      ELSE CAST(p.nt AS DOUBLE) / p.nw END AS fertility
       |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin
      .replace("\n", " ")

  /** DuckDB replay of [[bpeBudget]]: same CTEs, grouped by source.
    * Both ratio operands cast to DOUBLE explicitly so the division is
    * the identical IEEE op on both engines (DuckDB window sum over
    * BIGINT is HUGEINT). Same NULL-text mirror as
    * [[bpeTokenCountSql]]: a NULL-text doc contributes NULL (ignored
    * by sum, as Spark's NULL nw_doc/nt_doc are) instead of 0, so a
    * source whose every doc has NULL text sums to NULL on both
    * engines rather than 0 here vs NULL there.
    */
  val bpeBudgetSql: String =
    s"""WITH RECURSIVE $perDocCte
       |SELECT source, n_docs, n_words, n_bpe_tokens,
       | CAST(n_bpe_tokens AS DOUBLE) /
       |   CAST(sum(n_bpe_tokens) OVER () AS DOUBLE) AS share,
       | CASE WHEN n_words = 0 THEN NULL
       |      ELSE CAST(n_bpe_tokens AS DOUBLE) / n_words END AS undercount
       |FROM (
       | SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN d.text IS NULL THEN NULL
       |                ELSE coalesce(p.nw, 0) END) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN d.text IS NULL THEN NULL
       |                ELSE coalesce(p.nt, 0) END) AS BIGINT) AS n_bpe_tokens
       | FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
       | GROUP BY d.source)""".stripMargin.replace("\n", " ")
}
