package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash
import graft.sampling.Sampling
import graft.relational.GlobalIndex
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

  /** Systematic weighted sampling — the pow()-free, shuffle-light way to
    * draw a token-budgeted training subset with inclusion probability
    * proportional to document weight: lay every document's token count
    * along one line via a DISTRIBUTED prefix sum ([[GlobalIndex
    * .withPrefixSum]] — range-parallel, never one ordered-window task),
    * then take one sample at every multiple of (total_tokens DIV n).
    * A document is drawn c times where c = #multiples inside its
    * [prefix, prefix+w) span — so documents longer than the stride can
    * repeat (epoch-style oversampling of long docs), short ones are
    * drawn with probability w/stride, and the draw is a pure function
    * of the corpus (integer arithmetic end to end; no per-row pow/ln
    * the cross-engine bit contract can't cover). The whole draw is one
    * prefix-sum pass + a projection — no per-stratum shuffles.
    */
  val systematicSample: Q = (s, dir) => {
    val n = 100L
    val t = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val cum = GlobalIndex.withPrefixSum(t, Seq("doc_id"), "n_tokens",
      cumName = "cum_incl")
    val tot = cum.agg(max(col("cum_incl")).as("w_total"))
    cum.crossJoin(broadcast(tot))
      // a corpus shorter than the budget would give stride 0: floor the
      // stride at 1 (degenerate case = take everything, weighted)
      .withColumn("stride", greatest(expr(s"w_total DIV ${n}L"), lit(1L)))
      // draws = multiples of stride inside (cum_incl - n_tokens, cum_incl]
      // (m >= 1, so the total draw count is exactly w_total DIV stride);
      // every operand is non-negative, so both engines' DIV agree
      .withColumn("n_copies", expr(
        "cum_incl DIV stride - (cum_incl - n_tokens) DIV stride"))
      .filter(col("n_copies") > 0L)
      .select(col("doc_id"), col("n_tokens"),
        (col("cum_incl") - col("n_tokens")).as("offset"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  val systematicSampleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]|\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |         CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_incl,
      |         CAST(sum(n_tokens) OVER () AS BIGINT) AS w_total
      |  FROM t),
      |k AS (
      |  SELECT doc_id, n_tokens, cum_incl, greatest(w_total // 100, 1) AS stride
      |  FROM c)
      |SELECT doc_id, n_tokens, CAST(cum_incl - n_tokens AS BIGINT) AS offset,
      |       CAST(cum_incl // stride - (cum_incl - n_tokens) // stride AS BIGINT) AS n_copies
      |FROM k
      |WHERE cum_incl // stride - (cum_incl - n_tokens) // stride > 0
      |ORDER BY doc_id""".stripMargin


  /** Neyman-allocated stratified sample over sources: each stratum's draw
    * count n_h ∝ N_h·σ_h (size × token-count spread — the allocation that
    * minimizes the variance of the corpus-mean estimator at fixed total
    * budget n = 200), then n_h docs drawn per stratum by portable-hash
    * order. One aggregate pass for the per-stratum moments (exact integer
    * sums; σ's variance expression is pinned-op-order IEEE), the N_h·σ_h
    * weights quantize 1e6 into exact integers before the bounded
    * |sources|-row share division, and the per-stratum draw is the
    * WindowGroupLimit top-n_h shape (pruned before any sort spills —
    * never a global-order window).
    */
  val stratifiedNeyman: Q = (s, dir) => {
    val n = 200L
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("w"))
    val dec = org.apache.spark.sql.types.DecimalType(25, 0)
    val stats = t.groupBy(col("source")).agg(
        count(lit(1)).as("n_h"),
        sum(col("w").cast(dec)).as("sw"),
        sum((col("w") * col("w")).cast(dec)).as("sww"))
      // variance clamped at zero BEFORE the sqrt (ADVICE r13 #1): double
      // rounding can push the operand slightly negative for a near-
      // constant-weight stratum once sw² exceeds 2^53 — Spark's sqrt would
      // return NaN while DuckDB THROWS, a cross-engine divergence; the
      // identical greatest() rides in the oracle
      .withColumn("sigma", sqrt(greatest(
        (col("sww").cast("double") -
          col("sw").cast("double") * col("sw").cast("double") / col("n_h").cast("double"))
          / col("n_h").cast("double"), lit(0.0))))
      .withColumn("t_h",
        floor(col("n_h").cast("double") * col("sigma") * lit(1e6) + lit(0.5)).cast(dec))
    val tot = stats.agg(sum(col("t_h")).as("t_tot"), sum(col("n_h")).as("n_tot"))
    // an all-constant corpus (every sigma 0) has no variance to allocate
    // against: Neyman's sigma->equal limit is proportional allocation, so
    // the share falls back to n_h/n_tot instead of 0/0
    val share = when(col("t_tot") === lit(0L),
        col("n_h").cast("double") / col("n_tot").cast("double"))
      .otherwise(col("t_h").cast("double") / col("t_tot").cast("double"))
    // allocation capped at the stratum size (ADVICE r13 #2): Neyman can
    // assign a small high-σ stratum more draws than it has documents; an
    // uncapped alloc would silently under-deliver through the rank filter
    val alloc = stats.crossJoin(broadcast(tot))
      .select(col("source"), col("n_h"), graft.Parity.pround(col("sigma"), 6).as("sigma"),
        least(floor(lit(n).cast("double") * share + lit(0.5)).cast("long"),
          col("n_h")).as("alloc"))
    val ranked = t.withColumn("h_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
          .orderBy(PortableHash.hash32(concat_ws("|", lit("neyman"), col("doc_id"))),
            col("doc_id"))).cast("long"))
    ranked.join(broadcast(alloc), "source")
      .filter(col("h_rank") <= col("alloc"))
      .select(col("source"), col("doc_id"), col("h_rank"),
        col("n_h"), col("sigma"), col("alloc"))
      .orderBy(col("source"), col("h_rank"))
  }

  val stratifiedNeymanSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS BIGINT) AS w
       |  FROM documents),
       |st AS (
       |  SELECT source, count(*) AS n_h,
       |         sum(CAST(w AS DECIMAL(25,0))) AS sw,
       |         sum(CAST(w * w AS DECIMAL(25,0))) AS sww
       |  FROM t GROUP BY 1),
       |sg AS (
       |  -- variance clamped at zero (mirrors the engine's greatest):
       |  -- DuckDB sqrt(negative) THROWS where Spark returns NaN
       |  SELECT source, n_h,
       |         sqrt(greatest((CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(n_h AS DOUBLE)) / CAST(n_h AS DOUBLE), CAST(0 AS DOUBLE))) AS sigma
       |  FROM st),
       |wt AS (
       |  SELECT source, n_h, sigma,
       |         CAST(floor(CAST(n_h AS DOUBLE) * sigma * 1e6 + 0.5) AS DECIMAL(25,0)) AS t_h
       |  FROM sg),
       |tt AS (SELECT sum(t_h) AS t_tot, sum(n_h) AS n_tot FROM wt),
       |al AS (
       |  -- all-sigma-zero corpus: proportional-allocation fallback (no 0/0);
       |  -- alloc capped at the stratum size (mirrors the engine's least)
       |  SELECT source, n_h, sigma,
       |         least(CAST(floor(CAST(200 AS DOUBLE) * (CASE WHEN tt.t_tot = 0
       |             THEN CAST(n_h AS DOUBLE) / CAST(tt.n_tot AS DOUBLE)
       |             ELSE CAST(t_h AS DOUBLE) / CAST(tt.t_tot AS DOUBLE) END) + 0.5) AS BIGINT),
       |           CAST(n_h AS BIGINT)) AS alloc
       |  FROM wt CROSS JOIN tt),
       |rk AS (
       |  SELECT doc_id, source,
       |         CAST(row_number() OVER (PARTITION BY source
       |           ORDER BY (${graft.functions.PortableHash.hash32Sql("'neyman|' || CAST(doc_id AS VARCHAR)")}), doc_id) AS BIGINT) AS h_rank
       |  FROM t)
       |SELECT r.source, r.doc_id, r.h_rank,
       |       CAST(a.n_h AS BIGINT) AS n_h,
       |       ${graft.Parity.proundSql("a.sigma", 6)} AS sigma, a.alloc
       |FROM rk r JOIN al a USING (source)
       |WHERE r.h_rank <= a.alloc
       |ORDER BY r.source, r.h_rank""".stripMargin


  val queries: Map[String, Q] = Map(
    "source_mixture" -> sourceMixture,
    "train_test_split" -> trainTestSplit,
    "split_summary" -> splitSummary,
    "corpus_stats" -> corpusStats,
    "sample_by_key" -> sampleByKey,
    "seq_pack" -> seqPack,
    "systematic_sample" -> systematicSample,
    "stratified_neyman" -> stratifiedNeyman)

  val oracleSql: Map[String, String] = Map(
    "source_mixture" -> sourceMixtureSql,
    "train_test_split" -> trainTestSplitSql,
    "split_summary" -> splitSummarySql,
    "corpus_stats" -> corpusStatsSql,
    "sample_by_key" -> sampleByKeySql,
    "seq_pack" -> seqPackSql,
    "systematic_sample" -> systematicSampleSql,
    "stratified_neyman" -> stratifiedNeymanSql)
}
