package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash
import graft.sampling.Sampling
import graft.text.TextAnalysis

/** Deterministic sampling/splitting + corpus rollup queries (training-data
  * pipeline surface), oracle-checked via the portable md5 hash.
  */
object SamplingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val bucketSqlExpr =
    s"(${PortableHash.hash32Sql("doc_id")}) % 100"

  /** 80/10/10 train/val/test assignment over documents. */
  val trainTestSplit: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Sampling.bucket(col("doc_id")).as("bucket"),
        Sampling.split(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      .orderBy(col("doc_id"))

  val trainTestSplitSql: String =
    s"""SELECT doc_id,
       |       $bucketSqlExpr AS bucket,
       |       CASE WHEN $bucketSqlExpr < 80 THEN 'train'
       |            WHEN $bucketSqlExpr < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Split-level rollup: sizes must be stable for reproducible training. */
  val splitSummary: Q = (s, dir) =>
    trainTestSplit(s, dir)
      .join(Tables.documents(s, dir), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("split"))

  val splitSummarySql: String =
    s"""WITH sp AS (
       |  SELECT doc_id, n_chars,
       |         CASE WHEN $bucketSqlExpr < 80 THEN 'train'
       |              WHEN $bucketSqlExpr < 90 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents)
       |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-source corpus statistics: doc counts, exact token totals,
    * interpolated median tokens, mean chars.
    */
  val corpusStats: Q = (s, dir) => {
    val withTokens = Tables.documents(s, dir)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
    withTokens.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        graft.Parity.pround(expr("percentile(n_tokens, 0.5)"), 6).as("p50_tokens"),
        graft.Parity.pround(
          sum(col("n_chars")).cast("double") / count(lit(1)), 6).as("avg_chars"))
      .orderBy(col("source"))
  }

  val corpusStatsSql: String =
    s"""WITH t AS (
       |  SELECT source, n_chars,
       |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS n_tokens
       |  FROM documents)
       |SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |       ${graft.Parity.proundSql("quantile_cont(CAST(n_tokens AS DOUBLE), 0.5)", 6)} AS p50_tokens,
       |       ${graft.Parity.proundSql("CAST(sum(n_chars) AS DOUBLE) / count(*)", 6)} AS avg_chars
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic 10% sample: hash-of-key bucket < fraction·buckets —
    * stable across runs, engines, and cluster sizes (never rand()).
    */
  val sampleByKey: Q = (s, dir) =>
    Sampling.sampleByKey(Tables.documents(s, dir), col("doc_id"), 0.1)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id"))

  val sampleByKeySql: String =
    s"""SELECT doc_id, source, lang FROM documents
       |WHERE (${PortableHash.hash32Sql("doc_id")}) % 10000 < 1000
       |ORDER BY doc_id""".stripMargin

  /** Concat-and-chunk sequence packing into 512-token training sequences,
    * packed per source shard (see Sampling.packSequences for the scale
    * story). Every doc's (seq_id, seq_offset, end_seq_id) coordinates are
    * pure integer prefix-sum arithmetic — hash-checked bit-exact.
    */
  val seqPack: Q = (s, dir) => {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.packSequences(t, "doc_id", "n_tokens", 512L, Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("seq_id"), col("seq_offset"), col("end_seq_id"))
      .orderBy(col("source"), col("doc_id"))
  }

  val seqPackSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, source, n_tokens,
       |         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM t)
       |SELECT doc_id, source, n_tokens,
       |       CAST(cum_before // 512 AS BIGINT) AS seq_id,
       |       CAST(cum_before % 512 AS BIGINT) AS seq_offset,
       |       CAST((cum_before + greatest(n_tokens, 1) - 1) // 512 AS BIGINT) AS end_seq_id
       |FROM p ORDER BY source, doc_id""".stripMargin

  /** Data-mixing report: a 4-rate mixture (src0 100%, src1 75%, src2 50%,
    * src3 25%, everything else 10%) evaluated as keep flags in ONE corpus
    * scan — per source: total docs, kept docs, kept tokens, achieved
    * fraction. Deterministic hash sampling means the achieved mixture is a
    * pure function of the weight config, reproducible across runs/engines.
    */
  private val MixRates = Map("src0" -> 1.0, "src1" -> 0.75,
    "src2" -> 0.5, "src3" -> 0.25)
  private val MixDefault = 0.1

  val sourceMixture: Q = (s, dir) => {
    val keep = Sampling.bucket(col("doc_id")) <
      Sampling.mixtureCutoff(col("source"), MixRates, MixDefault, buckets = 100)
    Tables.documents(s, dir)
      .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, col("n_tokens")).otherwise(0L)).as("tokens_kept"),
        graft.Parity.pround(
          sum(when(keep, 1L).otherwise(0L)).cast("double") / count(lit(1)), 6)
          .as("achieved_frac"))
      .orderBy(col("source"))
  }

  val sourceMixtureSql: String = {
    val cutoff = MixRates.toSeq.sortBy(_._1).reverse
      .foldLeft(s"${math.round(MixDefault * 100)}") { case (acc, (src, r)) =>
        s"CASE WHEN source = '$src' THEN ${math.round(r * 100)} ELSE $acc END"
      }
    s"""WITH t AS (
       |  SELECT source,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS BIGINT) AS n_tokens,
       |         ((${PortableHash.hash32Sql("doc_id")}) % 100) < ($cutoff) AS keep
       |  FROM documents)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       |       ${graft.Parity.proundSql(
              "CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)} AS achieved_frac
       |FROM t GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "source_mixture" -> sourceMixture,
    "train_test_split" -> trainTestSplit,
    "split_summary" -> splitSummary,
    "corpus_stats" -> corpusStats,
    "sample_by_key" -> sampleByKey,
    "seq_pack" -> seqPack)

  val oracleSql: Map[String, String] = Map(
    "source_mixture" -> sourceMixtureSql,
    "train_test_split" -> trainTestSplitSql,
    "split_summary" -> splitSummarySql,
    "corpus_stats" -> corpusStatsSql,
    "sample_by_key" -> sampleByKeySql,
    "seq_pack" -> seqPackSql)
}
