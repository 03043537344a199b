package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling & dataset splitting for training-data pipelines.
  *
  * Everything is hash-of-key based — never `rand()`: assignments are stable
  * across runs, retries, cluster sizes, and engines (the bucket hash is the
  * portable md5 parse), which is what makes train/test splits reproducible
  * and leak-free at 100 TB. Per-row work only: no shuffle, fully parallel.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column. */
  def bucket(key: Column, buckets: Int = 100): Column =
    pmod(PortableHash.hash32(key), lit(buckets.toLong))

  /** Deterministic fraction sample: keep rows whose key-bucket falls below
    * fraction·buckets.
    */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 10000): DataFrame =
    df.filter(bucket(key, buckets) < lit((fraction * buckets).toLong))

  /** Train/val/test assignment from cumulative percentage cutoffs, e.g.
    * `split(col, Seq("train" -> 80, "val" -> 10, "test" -> 10))`.
    */
  def split(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val b = bucket(key, 100)
    val cutoffs = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    weights.zip(cutoffs).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cut)) =>
        when(acc.isNotNull, acc).when(b < cut, name).otherwise(lit(null))
    }
  }

  /** Per-source mixture sampling — the data-mixing op that turns raw corpus
    * proportions into a training mixture: each source keeps a deterministic
    * hash fraction of its documents at that source's configured rate
    * (unlisted sources fall back to `defaultRate`). Same stability story as
    * [[sampleByKey]] (never `rand()`), plus the monotone-prefix property
    * per source: raising one source's rate only ADDS documents, so mixture
    * re-weighting between training runs reuses everything already selected.
    *
    * Rates compile to a literal CASE chain — right for O(100) named
    * sources; a mixture over unbounded source cardinality would broadcast-
    * join a weights dimension instead (same per-row work after the join).
    */
  def mixtureSample(df: DataFrame, key: Column, sourceCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      buckets: Int = 10000): DataFrame =
    df.filter(bucket(key, buckets) < mixtureCutoff(sourceCol, rates, defaultRate, buckets))

  /** The per-row bucket cutoff implementing a mixture's rates (exposed so
    * reporting queries can compute keep flags without filtering).
    */
  def mixtureCutoff(sourceCol: Column, rates: Map[String, Double],
      defaultRate: Double, buckets: Int = 10000): Column =
    // round, not truncate: 0.57 * 100 is 56.999… in doubles, and truncation
    // would silently shave a full bucket off any rate that is not exactly
    // representable
    rates.toSeq.sortBy(_._1).foldLeft(lit(math.round(defaultRate * buckets))) {
      case (acc, (src, r)) =>
        when(sourceCol === src, lit(math.round(r * buckets))).otherwise(acc)
    }

  /** Concat-and-chunk sequence packing — the GPT-style pretraining layout:
    * documents concatenate in a fixed deterministic order and the token
    * stream is cut every `seqLen` tokens, so no padding waste anywhere and
    * a doc may span a sequence boundary. Each doc gets the sequence id and
    * offset where it starts plus the sequence where it ends; the writer
    * that materializes training shards needs exactly these coordinates.
    *
    * Unlike first-fit bin packing (inherently sequential, order-dependent
    * output), concat-and-chunk is a pure prefix sum — deterministic and
    * window-parallel. The prefix sum partitions by `keyCols` (pack within
    * source/shard): parallelism = |sources|, the same keying story as the
    * multi-symbol windows, with the chunked-scan machinery as the fallback
    * for one whale source. All integer arithmetic — bit-exact cross-engine.
    */
  def packSequences(docs: DataFrame, orderCol: String, tokensCol: String,
      seqLen: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("cum_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"cum_before DIV $seqLen"))
      .withColumn("seq_offset", expr(s"cum_before % $seqLen"))
      // empty docs occupy no tokens: they "end" where they start
      .withColumn("end_seq_id",
        expr(s"(cum_before + greatest($tokensCol, 1L) - 1L) DIV $seqLen"))
  }
}
