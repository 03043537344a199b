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

  /** Within-document repetition (Gopher/C4-style quality signal): the
    * fraction of a doc's word 3-grams that are duplicates of an earlier
    * 3-gram. High ratios mark boilerplate/spam for curation filters. Pure
    * per-row array math (the shingle array is built from the doc's own
    * word array — zero shuffle); the total 3-gram count comes from the
    * word count (size(w)-2), so the shingle array has a single consumer
    * chain and Catalyst's CollapseProject inlining stays cheap.
    */
  val dupNgramRatio: Q = (s, dir) => {
    val n = 3
    val parts = (0 until n).map(i => if (i == 0) "w[i]" else s"w[i+$i]").mkString(", ")
    Tables.documents(s, dir)
      .withColumn("w", TextAnalysis.words(col("text")))
      .select(col("doc_id"),
        greatest(size(col("w")) - (n - 1), lit(0)).cast("long").as("n_ngrams"),
        expr(
          s"""CASE WHEN size(w) >= $n THEN CAST(size(array_distinct(
             |  transform(sequence(0, size(w) - $n), i -> concat_ws(' ', $parts)))) AS BIGINT)
             |ELSE CAST(0 AS BIGINT) END""".stripMargin).as("n_distinct"))
      .select(col("doc_id"), col("n_ngrams"), col("n_distinct"),
        when(col("n_ngrams") > 0,
          graft.Parity.pround(
            lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams").cast("double"), 6))
          .otherwise(lit(0.0)).as("dup_ratio"))
      .orderBy(col("doc_id"))
  }

  val dupNgramRatioSql: String =
    s"""WITH $normedSql,
       |sh AS (
       |  SELECT doc_id,
       |         CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_ngrams,
       |         CASE WHEN len(ws) >= 3
       |              THEN CAST(len(list_distinct(list_transform(range(0, len(ws) - 2),
       |                     i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))) AS BIGINT)
       |              ELSE CAST(0 AS BIGINT) END AS n_distinct
       |  FROM w)
       |SELECT doc_id, n_ngrams, n_distinct,
       |       CASE WHEN n_ngrams > 0
       |            THEN floor((1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)) * 1e6 + 0.5) / 1e6
       |            ELSE 0.0 END AS dup_ratio
       |FROM sh ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary head: top-100 tokens by frequency with a total
    * deterministic tie-break — the first step of tokenizer/vocab
    * construction. One explode + one hash aggregate with map-side partial
    * counts (the shuffle carries |distinct tokens per partition| rows, not
    * the token stream), then a global top-k (TakeOrdered, no full sort).
    */
  val vocabTopK: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(TextAnalysis.words(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(100)

  val vocabTopKSql: String =
    s"""WITH $normedSql,
       |tok AS (SELECT unnest(ws) AS token FROM w)
       |SELECT token, count(*) AS n FROM tok
       |WHERE length(token) > 0
       |GROUP BY token ORDER BY n DESC, token LIMIT 100""".stripMargin

  val queries: Map[String, Q] = Map(
    "text_stats" -> textStats,
    "text_quality" -> qualityScore,
    "token_count" -> tokenCount,
    "lang_id" -> langId,
    "doc_fingerprint" -> docFingerprint,
    "token_quantiles" -> tokenQuantiles,
    "dup_ngram_ratio" -> dupNgramRatio,
    "vocab_topk" -> vocabTopK)

  val oracleSql: Map[String, String] = Map(
    "text_stats" -> textStatsSql,
    "text_quality" -> qualityScoreSql,
    "token_count" -> tokenCountSql,
    "lang_id" -> langIdSql,
    "doc_fingerprint" -> docFingerprintSql,
    "token_quantiles" -> tokenQuantilesSql,
    "dup_ngram_ratio" -> dupNgramRatioSql,
    "vocab_topk" -> vocabTopKSql)
}
