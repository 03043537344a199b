package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * normalization, quality stats, token counting, language-ID,
  * fingerprinting. All per-row expressions (no shuffle, fully
  * codegen-friendly, embarrassingly parallel at 100 TB).
  *
  * Cross-engine parity notes: regexes are restricted to character classes
  * that behave identically in Java regex (Spark) and RE2 (DuckDB oracle);
  * everything word-based goes through `split` + array ops instead of
  * `\b`-style boundaries.
  */
object TextAnalysis {

  /** Canonical normalization: lowercase, non-alphanumerics → single space,
    * trimmed. The shared foundation for fingerprints, shingles, minhash.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))

  /** Normalized word array. */
  def words(c: Column): Column = split(normText(c), " ")

  private val stopEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a", "on", "with")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "es", "por")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine")
  private val stopFr = Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "il")

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** Count of words from `ws` in the normalized word array. */
  def wordSetCount(textCol: String, ws: Seq[String]): Column =
    expr(s"size(filter(split(trim(regexp_replace(lower($textCol), '[^a-z0-9]+', ' ')), ' '), w -> w IN (${inList(ws)})))")

  def stopwordCount(textCol: String): Column = wordSetCount(textCol, stopEn)

  /** Per-document quality/statistics columns (doc_id + metrics).
    * All ratios are exact integer-ratio doubles rounded to 6 — deterministic
    * across engines.
    */
  def textStats(docs: DataFrame): DataFrame = {
    val wc = size(words(col("text")))
    val chars = length(col("text"))
    val wordChars = expr("aggregate(transform(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), w -> length(w)), 0, (acc, x) -> acc + x)")
    docs.select(
      col("doc_id"),
      chars.as("n_chars_calc"),
      wc.as("word_count"),
      graft.Parity.pround(wordChars.cast("double") / wc, 6).as("avg_word_len"),
      size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).as("punct_count"),
      size(expr("regexp_extract_all(text, '[0-9]', 0)")).as("digit_count"),
      stopwordCount("text").as("stopword_count"),
      graft.Parity.pround(stopwordCount("text").cast("double") / wc, 6).as("stopword_ratio"))
  }

  /** The composite quality formula over already-computed stat columns —
    * the SINGLE definition every consumer ([[qualityScore]], the
    * kappa-agreement rater, curriculum sharding's oracle twin) must share:
    * a constant drifting in one copy would silently diverge the gates.
    */
  def qualityScoreCol(wordCount: Column, stopwordRatio: Column,
      punctCount: Column): Column = {
    val lengthTerm = least(wordCount.cast("double") / 50d, lit(1d))
    val stopTerm = least(stopwordRatio * 5d, lit(1d))
    val punctTerm = greatest(lit(0d),
      lit(1d) - punctCount.cast("double") / greatest(wordCount, lit(1)))
    graft.Parity.pround(
      lit(0.4) * lengthTerm + lit(0.3) * stopTerm + lit(0.3) * punctTerm, 6)
  }

  /** Heuristic quality score in [0,1]: favors mid-length docs with a sane
    * stopword ratio and low punctuation density. Deterministic per-row math.
    */
  def qualityScore(docs: DataFrame): DataFrame =
    textStats(docs).select(col("doc_id"),
      qualityScoreCol(col("word_count"), col("stopword_ratio"),
        col("punct_count")).as("quality_score"))

  /** BPE-ish token count: letter runs, single digits, punctuation runs,
    * whitespace runs — the standard pre-tokenizer shape.
    */
  def tokenCount(textCol: Column): Column =
    size(expr(s"regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\\\s]|\\\\s+', 0)"))

  /** n-gram-free language ID: per-language stopword hits over the word set,
    * argmax with a fixed tie-break order (en > es > de > fr > und).
    */
  def langId(docs: DataFrame): DataFrame = {
    val en = wordSetCount("text", stopEn)
    val es = wordSetCount("text", stopEs)
    val de = wordSetCount("text", stopDe)
    val fr = wordSetCount("text", stopFr)
    docs.select(
      col("doc_id"), en.as("score_en"), es.as("score_es"), de.as("score_de"), fr.as("score_fr"))
      .withColumn("lang_pred",
        when(col("score_en") >= greatest(col("score_es"), col("score_de"), col("score_fr"))
          && col("score_en") > 0, "en")
        .when(col("score_es") >= greatest(col("score_de"), col("score_fr"))
          && col("score_es") > 0, "es")
        .when(col("score_de") >= col("score_fr") && col("score_de") > 0, "de")
        .when(col("score_fr") > 0, "fr")
        .otherwise("und"))
  }

  /** Document fingerprint: md5 of the normalized text (rolling-hash class
    * of fingerprints reduces to a canonical-form digest here; stable across
    * engines and whitespace/punctuation variations).
    */
  def fingerprint(textCol: Column): Column = md5(normText(textCol))
}
