package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. Every expression
  * is chosen to have an exact ANSI-SQL mirror (no transcendental
  * functions, integer counts where possible) so results oracle-compare
  * bit for bit.
  */
object TextAnalysis {

  private val enStop = Seq("the", "and", "of", "to", "is", "a")
  private val deStop = Seq("der", "die", "und", "das", "nicht", "ein")
  private val esStop = Seq("que", "los", "las", "una", "por", "el")
  private val frStop = Seq("le", "les", "des", "une", "est", "dans")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*))).cast("long")

  /** CJK character count (zh detector). DuckDB mirror:
    * len(regexp_extract_all(text, '[一-鿿]')) */
  private def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0))).cast("long")

  /** n-gram/stopword-heuristic language ID over {en,de,es,fr,zh}:
    * CJK presence wins, otherwise argmax of per-language stopword hit
    * counts with a fixed tie order (en > de > es > fr). */
  /** Append the language-ID columns (s_en..s_zh, pred_lang) to the
    * frame WITHOUT projecting the input away — the composable form a
    * pipeline wants (row-local, fuses into the scan, no join back).
    * Tokenizes once into an internal column, dropped on exit; the
    * four stopword counters read the bound attribute instead of
    * re-running the tokenizer (CollapseProject keeps multi-referenced
    * non-trivial aliases materialized, so this is one tokenizer pass
    * per row, not four).
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__ltoks")
    df.withColumn("__ltoks", TextPrep.tokens(col(textCol)))
      .withColumn("s_en", stopCount(toks, enStop))
      .withColumn("s_de", stopCount(toks, deStop))
      .withColumn("s_es", stopCount(toks, esStop))
      .withColumn("s_fr", stopCount(toks, frStop))
      .withColumn("s_zh", cjkCount(col(textCol)))
      .withColumn("pred_lang",
        when(col("s_zh") > 0, "zh")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .drop("__ltoks")
  }

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withLangId(df, textCol)
      .select(col(idCol), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
        col("s_zh"), col("pred_lang"))
      .orderBy(col(idCol).asc)

  /** Quality signals: token count, distinct-token ratio, mean token
    * length, punctuation & digit counts, stopword ratio, and a
    * composite score using only +,*,/ on exact integers (bit-stable).
    */
  /** Append the quality columns (counts + composite quality_score) to
    * the frame without projecting the input away — composable twin of
    * [[withLangId]]; one tokenizer pass per row.
    */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = col("__qtoks")
    df.withColumn("__qtoks", TextPrep.tokens(col(textCol)))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_punct", size(regexp_extract_all(col(textCol), lit("[\\.,;:!\\?]"), lit(0))).cast("long"))
      .withColumn("n_digit", size(regexp_extract_all(col(textCol), lit("[0-9]"), lit(0))).cast("long"))
      .withColumn("n_stop", stopCount(toks, enStop ++ deStop ++ esStop ++ frStop))
      .withColumn("text_len", length(col(textCol)).cast("long"))
      .withColumn("quality_score",
        col("n_distinct").cast("double") / greatest(col("n_tokens"), lit(1L)).cast("double") * lit(0.5)
          + col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1L)).cast("double") * lit(0.3)
          + when(col("n_tokens").between(20, 1000), lit(0.2)).otherwise(lit(0.0)))
      .drop("__qtoks")
  }

  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withQualityScore(df, textCol)
      .select(col(idCol), col("text_len"), col("n_tokens"), col("n_distinct"),
        col("n_punct"), col("n_digit"), col("n_stop"), col("quality_score"))
      .orderBy(col(idCol).asc)

  /** Token counting: whitespace split vs a BPE-ish regex segmentation
    * (letter runs | digit runs | single non-space symbol) vs distinct
    * word tokens. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    df.withColumn("ws_tokens",
        size(filter(split(col(textCol), "\\s+"), t => t =!= "")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long"))
      .withColumn("uniq_tokens",
        size(array_distinct(TextPrep.tokens(col(textCol)))).cast("long"))
      .select(col(idCol), col("ws_tokens"), col("re_tokens"), col("uniq_tokens"))
      .orderBy(col(idCol).asc)
  }

  /** PII scrubbing for training corpora: redact emails, IPv4 addresses
    * and long digit runs (ids/phones) with typed placeholders, plus
    * per-document redaction counts for audit. Pure regexp_replace
    * chain — same patterns work in any ANSI engine for verification.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val DigitRunRe = "[0-9]{5,}"

  def redactPii(df: DataFrame, idCol: String, textCol: String,
      digitRunRe: String = DigitRunRe): DataFrame =
    df.select(
        col(idCol),
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col(textCol), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(col(textCol), lit(digitRunRe), lit(0))).cast("long").as("n_digit_runs"),
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          digitRunRe, "<NUM>").as("redacted"))
      .orderBy(col(idCol).asc)

  /** Document fingerprint: md5 over the normalized text (lower-cased,
    * non-alphanumeric runs collapsed to single spaces, trimmed) — the
    * standard "same modulo whitespace/punctuation" dedup key.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        md5(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "))).as("fp"))
      .orderBy(col(idCol).asc)

  /** Canonical text normalization for multilingual corpora: Unicode
    * NFC + SIMPLE per-codepoint case folding in one native kernel
    * (graft.functions.NfcFoldExpr — context- and locale-free, unlike
    * Spark's `lower`), then whitespace runs (ASCII + Unicode space
    * separators) collapsed to single spaces and trimmed. The standard
    * pre-dedup / pre-tokenization cleanup; every step has an exact
    * DuckDB equivalent (lower(nfc_normalize(x)) / regexp_replace), so
    * the output is oracle-checkable byte-for-byte.
    */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        trim(regexp_replace(
          graft.functions.VectorExpressions.nfcFold(col(textCol)),
          "[\\s\\p{Z}]+", " ")).as("norm"))
      .withColumn("n_chars_norm", length(col("norm")).cast("long"))
      .orderBy(col(idCol).asc)

  /** Gopher-style repetition signals: duplicate-word fraction, most
    * frequent word's share, duplicate word-bigram fraction. Documents
    * dominated by repeated words/n-grams are low-quality training data
    * (boilerplate, keyword stuffing, generation loops).
    *
    * Scale design: everything here is a per-row expression — no
    * explode, no shuffle, the whole operator stays inside one narrow
    * codegen stage over the scan. All five integer counts come from a
    * single O(tokens) pass per document
    * ([[graft.functions.RepetitionStatsExpr]], exact hash-table
    * counting inside whole-stage codegen), which beats an
    * explode→groupBy→join-back (two shuffles of corpus-sized
    * intermediates) at any scale.
    *
    * Fractions use only integer counts and one IEEE division each, so
    * any ANSI engine reproduces them bit for bit.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // all five integer counts come from ONE O(tokens) codegen kernel
    // pass ([[graft.functions.RepetitionStatsExpr]]): the declarative
    // form this replaces ran O(distinct × tokens) interpreted HOF
    // lambdas per document (array_max(transform(array_distinct,
    // w -> size(filter(toks, _ === w)))) for the top word alone) plus
    // two more distinct passes for the duplicate counts. Counts are
    // exact, so the fractions below are the same IEEE divisions of
    // the same integers — bit-identical to the old plan and to the
    // DuckDB oracle's independent derivation.
    val st = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.RepetitionStatsExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          TextPrep.tokens(col(textCol)))))
    df.withColumn("__st", st)
      .withColumn("n_words", col("__st.n_words"))
      .withColumn("n_distinct", col("__st.n_distinct"))
      .withColumn("top_word_n", col("__st.top_word_n"))
      .withColumn("n_bigrams", col("__st.n_bigrams"))
      .withColumn("dup_bigram_n", col("__st.dup_bigram_n"))
      .withColumn("dup_word_frac",
        (col("n_words") - col("n_distinct")).cast("double")
          / greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("top_word_frac",
        col("top_word_n").cast("double")
          / greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("dup_bigram_frac",
        col("dup_bigram_n").cast("double")
          / greatest(col("n_bigrams"), lit(1L)).cast("double"))
      .select(col(idCol), col("n_words"), col("n_distinct"), col("top_word_n"),
        col("n_bigrams"), col("dup_bigram_n"), col("dup_word_frac"),
        col("top_word_frac"), col("dup_bigram_frac"))
      .orderBy(col(idCol).asc)
  }

  /** The Gopher quality rules (Rae et al. 2021, Appendix A) as one
    * named filter — the de-facto standard web-scale curation gate:
    *
    *   1. 50 <= word count <= 100,000
    *   2. mean word length in [3, 10]
    *   3. symbol-to-word ratio ("#" or "...") <= 0.1
    *   4. < 90% of lines start with a bullet
    *   5. <= 30% of lines end with an ellipsis
    *   6. >= 80% of words contain an alphabetic character
    *   7. at least 2 of the 8 Gopher stop words present
    *
    * Every ratio is evaluated as an integer cross-multiplication
    * (e.g. mean length: 3·n_words <= word_chars <= 10·n_words), so
    * there is no floating point anywhere in the decision and any ANSI
    * engine reproduces `keep` bit for bit. Words are whitespace
    * tokens (the paper's unit), not the engine tokenizer.
    *
    * Scale: a single narrow projection over the scan — per-row array
    * expressions only, no explode, no shuffle, whole-corpus
    * applicability is scan-bound.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withGopherRules(df, textCol)
      .select(col(idCol), col("n_words"), col("word_chars"),
        col("alpha_words"), col("n_symbols"), col("n_lines"),
        col("bullet_lines"), col("ellipsis_lines"), col("stops_present"),
        col("keep"))
      .orderBy(col(idCol).asc)

  /** Append the Gopher counts + `keep` to the frame without projecting
    * the input away — the composable twin of [[gopherRules]] (same
    * pattern as [[withQualityScore]]). `minStops` relaxes rule 7's
    * stop-word floor for corpora whose vocabulary lacks the English
    * function words (2 = the published threshold).
    */
  def withGopherRules(df: DataFrame, textCol: String,
      minStops: Int = 2): DataFrame = {
    val words = col("__words")
    val lines = col("__lines")
    val stopHits = Seq("the", "be", "to", "of", "and", "that", "have", "with")
      .map(w => array_contains(words, w).cast("int"))
      .reduce(_ + _)
    df.withColumn("__words",
        filter(split(col(textCol), "\\s+"), w => w =!= ""))
      .withColumn("__lines",
        transform(split(col(textCol), "\n"), l => trim(l)))
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("word_chars",
        aggregate(words, lit(0L), (acc, w) => acc + length(w)))
      .withColumn("alpha_words",
        size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_symbols",
        (size(regexp_extract_all(col(textCol), lit("#"), lit(0)))
          + size(regexp_extract_all(col(textCol), lit("\\.\\.\\."), lit(0)))).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("bullet_lines",
        size(filter(lines, l => substring(l, 1, 1).isin("-", "*", "•"))).cast("long"))
      .withColumn("ellipsis_lines",
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…"))).cast("long"))
      .withColumn("stops_present", stopHits.cast("long"))
      .withColumn("keep",
        col("n_words").between(50L, 100000L)
          && (lit(3L) * col("n_words") <= col("word_chars"))
          && (col("word_chars") <= lit(10L) * col("n_words"))
          && (lit(10L) * col("n_symbols") <= col("n_words"))
          && (lit(10L) * col("bullet_lines") < lit(9L) * col("n_lines"))
          && (lit(10L) * col("ellipsis_lines") <= lit(3L) * col("n_lines"))
          && (lit(5L) * col("alpha_words") >= lit(4L) * col("n_words"))
          && (col("stops_present") >= minStops.toLong))
      .drop("__words", "__lines")
  }
}
