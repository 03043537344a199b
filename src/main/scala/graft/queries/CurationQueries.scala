package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DocDedup
import graft.functions.PortableHash
import graft.sampling.Sampling
import graft.text.TextAnalysis

/** The flagship end-to-end training-data curation query: the full corpus
  * pipeline a 100 TB pretraining run needs, as ONE composed dataflow —
  *
  *   1. exact dedup (fingerprint group-by, keep lowest doc_id),
  *   2. near-dup removal (MinHash banding → LSH candidates → estimated
  *      Jaccard ≥ 0.5, drop the higher-id side — never all-pairs),
  *   3. quality gate (composite score ≥ 0.5) + language gate (lang-ID = en),
  *   4. deterministic 80/10/10 train/val/test assignment (hash-of-key,
  *      never rand()).
  *
  * Every stage reuses the already-oracle-checked operator (DocDedup,
  * TextAnalysis, Sampling); the oracle below recomputes the whole chain in
  * DuckDB, so the COMPOSITION is verified end-to-end, not just the parts.
  * Near-dup pairs are computed over the full corpus rather than the
  * exact-dedup survivors: exact duplicates share identical signatures, so
  * either ordering yields the same survivor set, and the full-corpus form
  * keeps one signature subtree shared with the standalone dedup queries.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  val corpusCuration: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val keepers = DocDedup.exactDuplicates(docs)
      .select(col("keep_doc_id").as("doc_id"))
    val drops = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id_b")).distinct()
    val quality = TextAnalysis.qualityScore(docs) // (doc_id, quality_score)
    val lang = TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred"))
    // keepers' ids are drawn from docs, so keepers IS the exact-dedup
    // survivor set — no join back to documents needed
    keepers
      .join(drops, col("doc_id") === col("doc_id_b"), "left_anti")
      .join(quality.filter(col("quality_score") >= 0.5), "doc_id")
      .join(lang.filter(col("lang_pred") === "en"), "doc_id")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"),
        Sampling.split(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      .orderBy(col("doc_id"))
  }

  val corpusCurationSql: String = {
    import DedupQueries.{sigsSql, bandsSql, pairsSql}
    import TextQueries.{stopCountSql, stopEn, stopEs, stopDe, stopFr}
    val eq = (0 until DocDedup.NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    // qualified: the final select joins three relations that all carry doc_id
    val bucket = s"(${PortableHash.hash32Sql("k.doc_id")}) % 100"
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |drops AS (
       |  SELECT DISTINCT c.doc_id_b
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id
       |  WHERE floor((CAST($eq AS DOUBLE) / ${DocDedup.NumHashes}) * 1e6 + 0.5) / 1e6 >= 0.5),
       |keepers AS (
       |  SELECT min(doc_id) AS doc_id FROM normed GROUP BY md5(norm)),
       |wq AS (
       |  -- derive from the sigs chain's normed CTE: ONE canonical
       |  -- normalization expression, not a third copy of it
       |  SELECT n.doc_id, d.text, string_split(n.norm, ' ') AS ws
       |  FROM normed n JOIN documents d ON n.doc_id = d.doc_id),
       |stats AS (
       |  SELECT doc_id,
       |         len(ws) AS word_count,
       |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |         floor((CAST(${stopCountSql(stopEn)} AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |  FROM wq),
       |quality AS (
       |  SELECT doc_id,
       |         floor((0.4 * least(CAST(word_count AS DOUBLE) / 50, 1.0)
       |             + 0.3 * least(stopword_ratio * 5, 1.0)
       |             + 0.3 * greatest(0.0, 1.0 - CAST(punct_count AS DOUBLE) / greatest(word_count, 1))) * 1e6 + 0.5) / 1e6
       |           AS quality_score
       |  FROM stats),
       |langscores AS (
       |  SELECT doc_id,
       |         ${stopCountSql(stopEn)} AS score_en,
       |         ${stopCountSql(stopEs)} AS score_es,
       |         ${stopCountSql(stopDe)} AS score_de,
       |         ${stopCountSql(stopFr)} AS score_fr
       |  FROM wq),
       |lang AS (
       |  SELECT doc_id,
       |         CASE
       |           WHEN score_en >= greatest(score_es, score_de, score_fr) AND score_en > 0 THEN 'en'
       |           WHEN score_es >= greatest(score_de, score_fr) AND score_es > 0 THEN 'es'
       |           WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
       |           WHEN score_fr > 0 THEN 'fr'
       |           ELSE 'und'
       |         END AS lang_pred
       |  FROM langscores)
       |SELECT k.doc_id, l.lang_pred, q.quality_score,
       |       CASE WHEN $bucket < 80 THEN 'train'
       |            WHEN $bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM keepers k
       |JOIN quality q ON k.doc_id = q.doc_id
       |JOIN lang l ON k.doc_id = l.doc_id
       |WHERE k.doc_id NOT IN (SELECT doc_id_b FROM drops)
       |  AND q.quality_score >= 0.5 AND l.lang_pred = 'en'
       |ORDER BY k.doc_id""".stripMargin
  }

  /** Curriculum sharding — deterministic data ORDERING for training:
    * rank the corpus by quality (best first, doc_id tie-break), then cut
    * the ranked stream into shards of ~equal TOKEN budget (4096 here —
    * a hyperparameter), so shard 0 is the highest-quality slice and a
    * trainer can schedule easy→hard (or anneal mixture weights) by shard
    * number. The assignment is a pure function of (quality, doc_id,
    * token counts) — re-running on identical data yields identical
    * shards, which is what makes a training run resumable.
    *
    * Scale shape: the only global coordination is the running token
    * total in rank order, and that uses [[graft.relational.GlobalIndex
    * .withPrefixSum]] — range-partition on the (quality desc, doc_id)
    * key, parallel local running sums, cross-partition offsets from a
    * per-partition SUM relation (one row per partition, broadcast back)
    * — never `sum() OVER (ORDER BY …)`'s single-task funnel, which the
    * oracle (corpus fits one node) is allowed to use but 100 TB is not.
    * The shard id is exact integer floor-division of the EXCLUSIVE
    * prefix (cum − own), so a whale document cannot straddle assignment.
    */
  val curriculumShards: Q = (s, dir) => {
    val budget = 4096L
    val docs = Tables.documents(s, dir)
    val base = TextAnalysis.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        Seq("doc_id"))
      // range keys sort ascending: negate the (already 1e-6-quantized,
      // so exactly negatable) score for best-first order
      .withColumn("ord", -col("quality_score"))
    graft.relational.GlobalIndex
      .withPrefixSum(base, Seq("ord", "doc_id"), "n_tokens",
        cumName = "cum_tokens")
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        col("cum_tokens"),
        // SQL `div`: exact BIGINT division (Spark's `/` is fractional —
        // a float quotient truncated back can land on the wrong side of
        // a boundary; DuckDB's `//` is the same exact integer op)
        expr(s"(cum_tokens - n_tokens) div $budget").as("shard"))
      .orderBy(col("doc_id"))
  }

  val curriculumShardsSql: String = {
    import TextQueries.{stopCountSql, stopEn}
    s"""WITH ${TextQueries.normedSql},
       |stats AS (
       |  SELECT doc_id,
       |         len(ws) AS word_count,
       |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |         floor((CAST(${stopCountSql(stopEn)} AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |  FROM w),
       |quality AS (
       |  SELECT doc_id,
       |         floor((0.4 * least(CAST(word_count AS DOUBLE) / 50, 1.0)
       |             + 0.3 * least(stopword_ratio * 5, 1.0)
       |             + 0.3 * greatest(0.0, 1.0 - CAST(punct_count AS DOUBLE) / greatest(word_count, 1))) * 1e6 + 0.5) / 1e6
       |           AS quality_score
       |  FROM stats),
       |toks AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS n_tokens
       |  FROM documents),
       |ranked AS (
       |  SELECT q.doc_id, q.quality_score, t.n_tokens,
       |         CAST(sum(t.n_tokens) OVER (
       |           ORDER BY q.quality_score DESC, q.doc_id) AS BIGINT) AS cum_tokens
       |  FROM quality q JOIN toks t ON q.doc_id = t.doc_id)
       |SELECT doc_id, quality_score, n_tokens, cum_tokens,
       |       (cum_tokens - n_tokens) // 4096 AS shard
       |FROM ranked ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "corpus_curation" -> corpusCuration,
    "curriculum_shards" -> curriculumShards)
  val oracleSql: Map[String, String] = Map(
    "corpus_curation" -> corpusCurationSql,
    "curriculum_shards" -> curriculumShardsSql)
}
