package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-semantics incremental writes on plain Parquet (SURVEY §4.3).
  *
  * The reference materializes silver/gold via dbt `incremental_strategy='merge'`
  * on day-partitioned tables (stg_eurusd.sql:1-12, fct_eurusd_timeframes.sql:1-13).
  * Vanilla Spark/Parquet has no MERGE, so we reproduce it with *dynamic
  * partition overwrite* scoped to the batch's day-partitions:
  *
  *  1. derive `p_date = to_date(tsCol)` and collect the batch's distinct days
  *     (bounded: one driver-side collect of a day list, never row data);
  *  2. `upsertByKey` anti-joins the existing rows of ONLY those day-partitions
  *     (partition-pruned read) against the batch keys and unions the batch —
  *     exact MERGE upsert cost-bounded to touched days;
  *  3. write `mode=overwrite` with `partitionOverwriteMode=dynamic`, which
  *     rewrites exactly the touched `p_date=` directories.
  *
  * At 100 TB: a daily batch touches O(1) day-partitions; the rewrite is
  * O(batch + touched-partition size), independent of table history size.
  */
object IncrementalStore {

  final val PartitionCol = "p_date"

  /** Read a store table back (partition column retained for pruning). */
  def readTable(spark: SparkSession, target: String): DataFrame =
    spark.read.parquet(target)

  private def exists(spark: SparkSession, target: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(target)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** P3/P4 watermark: max(tsCol) of the target, None if absent (first run).
    * One column-pruned scalar aggregate — parquet footer min/max make this
    * metadata-only at scale.
    */
  def highWatermark(spark: SparkSession, target: String, tsCol: String): Option[Timestamp] =
    if (!exists(spark, target)) None
    else {
      val row = readTable(spark, target).agg(max(col(tsCol))).first()
      if (row.isNullAt(0)) None else Some(row.getTimestamp(0))
    }

  private def withPartition(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn(PartitionCol, to_date(col(tsCol)))

  private def write(df: DataFrame, target: String, clusterBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // cluster_by analog (fct_eurusd_timeframes.sql:11): co-locate cluster key
    // rows within each day-partition file and keep them sorted for row-group
    // min/max pruning on the cluster column.
    val arranged =
      if (clusterBy.isEmpty) df
      else df
        .repartition((col(PartitionCol) +: clusterBy.map(col)): _*)
        .sortWithinPartitions((clusterBy :+ PartitionCol).map(col): _*)
    arranged.write
      .mode("overwrite")
      .partitionBy(PartitionCol)
      .option("compression", "snappy")
      .parquet(target)
  }

  /** Replace the batch's day-partitions wholesale (gold path: the batch is a
    * complete recompute of every candle-day it contains).
    */
  def overwriteDayPartitions(
      batch: DataFrame, target: String, tsCol: String,
      clusterBy: Seq[String] = Nil): Unit =
    write(withPartition(batch, tsCol), target, clusterBy)

  /** Day-scoped small-file compaction. Every incremental upsert rewrites its
    * touched day-partitions with one file per shuffle task, so hot days
    * accumulate small files over many batches — the classic warehouse decay
    * mode; at 100 TB unbounded file counts dominate scan open/footer costs.
    * Compaction re-reads ONLY the given days (partition-pruned) and rewrites
    * each as one file (or one per cluster key when `clusterBy` is set),
    * byte-identical data, bounded by the touched days like the merge itself.
    *
    * Pass the SAME `clusterBy` the table is written with (the store keeps
    * the cluster spec at call sites, like upsertByKey): compacting a
    * clustered table with the default would keep every value but silently
    * drop the cluster-sorted layout its row-group pruning relies on.
    */
  def compactDays(
      spark: SparkSession, target: String, days: Seq[java.sql.Date],
      clusterBy: Seq[String] = Nil): Unit = {
    val pruned = readTable(spark, target)
      .filter(col(PartitionCol).isin(days: _*))
    // one shuffle partition per day → one output file per day directory
    val arranged =
      if (clusterBy.isEmpty) pruned.repartition(col(PartitionCol))
      else pruned
    write(arranged, target, clusterBy)
  }

  /** MERGE upsert on `keyCols` bounded to the batch's day-partitions
    * (silver path: existing rows of touched days survive unless replaced by
    * a batch row with the same key).
    */
  def upsertByKey(
      batch: DataFrame, target: String, tsCol: String, keyCols: Seq[String],
      clusterBy: Seq[String] = Nil): Unit = {
    val spark = batch.sparkSession
    val part = withPartition(batch, tsCol)
    val merged =
      if (!exists(spark, target)) part
      else {
        val days = part.select(PartitionCol).distinct().collect().map(_.getDate(0))
        val old = readTable(spark, target)
          .filter(col(PartitionCol).isin(days.toIndexedSeq: _*))
          .select(part.columns.map(col): _*) // align column order
        old.join(part, keyCols, "left_anti").unionByName(part)
      }
    write(merged, target, clusterBy)
  }
}
