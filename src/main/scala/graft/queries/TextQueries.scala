package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis

/** Text-analysis driver queries over `documents`, with DuckDB oracles.
  * Shared SQL fragments mirror TextAnalysis's expressions; DuckDB
  * regexp_replace needs the 'g' flag (Spark replaces all matches by
  * default).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] val stopEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a", "on", "with")
  private[queries] val stopEs = Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "es", "por")
  private[queries] val stopDe = Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht", "ein", "eine")
  private[queries] val stopFr = Seq("le", "la", "les", "de", "et", "un", "une", "est", "dans", "que", "pour", "il")

  private def sqlList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  /** `normed`+`w` CTEs shared by every oracle. */
  val normedSql: String =
    """normed AS (
      |  SELECT doc_id, text,
      |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents),
      |w AS (SELECT doc_id, text, norm, string_split(norm, ' ') AS ws FROM normed)""".stripMargin

  private[queries] def stopCountSql(ws: Seq[String]): String =
    s"len(list_filter(ws, x -> x IN (${sqlList(ws)})))"

  val textStats: Q = (s, dir) =>
    TextAnalysis.textStats(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val textStatsSql: String =
    s"""WITH $normedSql
       |SELECT doc_id,
       |       length(text) AS n_chars_calc,
       |       len(ws) AS word_count,
       |       floor((CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS avg_word_len,
       |       len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |       len(regexp_extract_all(text, '[0-9]')) AS digit_count,
       |       ${stopCountSql(stopEn)} AS stopword_count,
       |       floor((CAST(${stopCountSql(stopEn)} AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |FROM w ORDER BY doc_id""".stripMargin

  val qualityScore: Q = (s, dir) =>
    TextAnalysis.qualityScore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val qualityScoreSql: String =
    s"""WITH $normedSql,
       |stats AS (
       |  SELECT doc_id,
       |         len(ws) AS word_count,
       |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |         floor((CAST(${stopCountSql(stopEn)} AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |  FROM w)
       |SELECT doc_id,
       |       floor((0.4 * least(CAST(word_count AS DOUBLE) / 50, 1.0)
       |           + 0.3 * least(stopword_ratio * 5, 1.0)
       |           + 0.3 * greatest(0.0, 1.0 - CAST(punct_count AS DOUBLE) / greatest(word_count, 1))) * 1e6 + 0.5) / 1e6
       |         AS quality_score
       |FROM stats ORDER BY doc_id""".stripMargin

  val tokenCount: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]|\s+')) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val langId: Q = (s, dir) =>
    TextAnalysis.langId(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val langIdSql: String =
    s"""WITH $normedSql,
       |scores AS (
       |  SELECT doc_id,
       |         ${stopCountSql(stopEn)} AS score_en,
       |         ${stopCountSql(stopEs)} AS score_es,
       |         ${stopCountSql(stopDe)} AS score_de,
       |         ${stopCountSql(stopFr)} AS score_fr
       |  FROM w)
       |SELECT doc_id, score_en, score_es, score_de, score_fr,
       |       CASE
       |         WHEN score_en >= greatest(score_es, score_de, score_fr) AND score_en > 0 THEN 'en'
       |         WHEN score_es >= greatest(score_de, score_fr) AND score_es > 0 THEN 'es'
       |         WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
       |         WHEN score_fr > 0 THEN 'fr'
       |         ELSE 'und'
       |       END AS lang_pred
       |FROM scores ORDER BY doc_id""".stripMargin

  val docFingerprint: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  val docFingerprintSql: String =
    s"""WITH $normedSql
       |SELECT doc_id, md5(norm) AS fp FROM normed ORDER BY doc_id""".stripMargin

  /** Per-language token-length distribution — the numbers a curation
    * pipeline turns into length-filter thresholds (p50/p90/p99). Exact
    * interpolated percentiles: Spark `percentile` and DuckDB
    * `quantile_cont` are bit-identical on doubles. Exact percentiles
    * buffer each group's values; at 100 TB the same query swaps in
    * `percentile_approx` (t-digest, mergeable partials) — kept exact here
    * because the oracle gate needs cross-engine bit-parity and language
    * groups are few.
    */
  val tokenQuantiles: Q = (s, dir) => {
    val t = Tables.documents(s, dir)
      .select(col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("n_tokens"))
    t.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col("n_tokens"), lit(0.5)).as("p50_tokens"),
        percentile(col("n_tokens"), lit(0.9)).as("p90_tokens"),
        percentile(col("n_tokens"), lit(0.99)).as("p99_tokens"),
        max(col("n_tokens")).cast("long").as("max_tokens"))
      .orderBy(col("lang"))
  }

  val tokenQuantilesSql: String =
    """WITH t AS (
      |  SELECT lang,
      |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]|\s+')) AS DOUBLE) AS n_tokens
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       quantile_cont(n_tokens, 0.5) AS p50_tokens,
      |       quantile_cont(n_tokens, 0.9) AS p90_tokens,
      |       quantile_cont(n_tokens, 0.99) AS p99_tokens,
      |       CAST(max(n_tokens) AS BIGINT) AS max_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_stats" -> textStats,
    "text_quality" -> qualityScore,
    "token_count" -> tokenCount,
    "lang_id" -> langId,
    "doc_fingerprint" -> docFingerprint,
    "token_quantiles" -> tokenQuantiles)

  val oracleSql: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_quality" -> qualityScoreSql,
    "token_count" -> tokenCountSql,
    "lang_id" -> langIdSql,
    "doc_fingerprint" -> docFingerprintSql,
    "token_quantiles" -> tokenQuantilesSql)
}
