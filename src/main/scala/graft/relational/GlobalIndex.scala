package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global row numbering.
  *
  * The naive form — `row_number() OVER (ORDER BY key)` with no PARTITION
  * BY — funnels the ENTIRE dataset through one task (Spark plans an empty
  * partitioning, i.e. a single-partition exchange), which is the
  * 100 TB anti-pattern: one executor sorts everything while the rest of
  * the cluster idles, then OOMs. The classic distributed rewrite keeps
  * the sort parallel and turns the global coordination into arithmetic
  * over per-partition COUNTS:
  *
  *  1. `repartitionByRange` on the order key — each partition holds a
  *     contiguous key range, partitions are mutually ordered, and the
  *     sort inside each is local (spillable, parallel).
  *  2. Per-partition local row numbers (a window PARTITIONED by the range
  *     partition id — parallel across partitions by construction).
  *  3. Per-partition row counts → prefix-sum offsets. This relation has
  *     one row PER PARTITION (hundreds, not billions), so the prefix-sum
  *     window over it is trivially cheap, and it broadcasts back.
  *
  * `global index = partition offset + local row number` is exact because
  * range partitions are totally ordered and the order key is required to
  * be UNIQUE per row (enforce by appending a tiebreak column): with
  * duplicates straddling a range boundary the index assignment within the
  * duplicate run would be partitioning-dependent.
  *
  * The range-partitioned relation (with its partition id stamped) is
  * scratch-materialized ONCE and read by both consumers (the local-number
  * window and the count aggregate) — re-deriving it twice could in
  * principle re-sample different range boundaries, which would silently
  * mis-align counts and local numbers. Materializing makes the boundary
  * assignment a fact on disk, not a recomputation.
  */
object GlobalIndex {

  /** Append `idx` (1-based, dense, following ORDER BY `orderCols`) to
    * `df`. `orderCols` must be a unique total order.
    *
    * `numPartitions <= 0` (the default) derives the range-partition count
    * from the cluster: `max(32, defaultParallelism)`. A fixed constant
    * here would be the 100 TB bug — 32 tasks each locally sorting billions
    * of rows — while the derived count scales with the executor fleet.
    * The produced index is partitioning-INDEPENDENT (the class invariant:
    * unique total order ⇒ offset+local is the same for any boundary set;
    * GlobalIndexSpec pins 1 vs 8 vs 32 vs 64 equality), so callers never
    * need to pin a count for correctness — only for tests.
    */
  def withGlobalIndex(
      df: DataFrame, orderCols: Seq[String], numPartitions: Int = 0,
      idxName: String = "idx"): DataFrame =
    // the row number IS the inclusive prefix count: one copy of the
    // boundary-sensitive scaffold (range partition, materialize-once,
    // offsets, broadcast join-back) lives in withPrefixSum
    withPrefixSum(df.withColumn("__one", lit(1L)), orderCols, "__one",
      numPartitions, cumName = idxName)
      .drop("__one")

  /** Append `cumName` = running total of LONG column `valueCol` in
    * `orderCols` order (inclusive: each row's own value is counted) —
    * the weighted generalization of [[withGlobalIndex]], and the same
    * distributed rewrite: the naive `sum() OVER (ORDER BY …)` funnels
    * everything through one task; here the range partitions carry local
    * running totals in parallel and the cross-partition coordination is a
    * prefix sum over per-partition SUMS (one row per partition,
    * broadcast back). Exact for the same reason: `orderCols` must be a
    * unique total order, so every boundary set yields the same prefix.
    */
  def withPrefixSum(
      df: DataFrame, orderCols: Seq[String], valueCol: String,
      numPartitions: Int = 0, cumName: String = "cum"): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(32, df.sparkSession.sparkContext.defaultParallelism)
    val cols: Seq[Column] = orderCols.map(col)
    val parted = graft.Scratch.table(
      df.repartitionByRange(parts, cols: _*)
        .withColumn("__pid", spark_partition_id()),
      "gpsum-parted")
    val localW = Window.partitionBy(col("__pid")).orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__lcum", sum(col(valueCol)).over(localW))
    val offsets = parted.groupBy(col("__pid")).agg(sum(col(valueCol)).as("__s"))
      .withColumn("__offset",
        coalesce(
          sum(col("__s")).over(
            Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(cumName, col("__offset") + col("__lcum"))
      .drop("__pid", "__lcum", "__offset")
  }
}
