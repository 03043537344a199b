package graft.forex

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.IncrementalStore

/** Incremental (micro-batch) materialization of silver + gold — the
  * reference's daily-cron execution model (daily_run.yml:4-6) as plain
  * batch functions.
  *
  * Silver (stg_eurusd.sql:14-40): strict high-watermark — only ticks with
  * `observed_at > max(observed_at)` enter the batch; late rows at or below
  * the watermark are dropped (reference semantics, SURVEY §2.10).
  *
  * Gold (fct_eurusd_timeframes.sql:15-86): 60-day lookback — re-reads
  * trailing silver history so ROWS-frame SMAs are correct across batch
  * boundaries, then wholesale-replaces the recomputed candle-day
  * partitions (SURVEY §4.3 option 1).
  *
  * `now` is injectable so tests are deterministic (no wall-clock in data).
  */
object ForexIncremental {

  final val LookbackDays = 60

  /** One silver batch: watermark-filter the raw ticks, dedup, upsert. */
  def runSilver(
      events: DataFrame, silverDir: String,
      now: Timestamp = new Timestamp(0L)): Unit = {
    val spark = events.sparkSession
    val wm = IncrementalStore.highWatermark(spark, silverDir, "observed_at")
    val fresh = wm match {
      case Some(w) => events.filter(col("ts") > lit(w))
      case None => events
    }
    val batch = ForexPipeline.silver(fresh)
      .withColumn("dbt_updated_at", lit(now))
    IncrementalStore.upsertByKey(
      batch, silverDir, tsCol = "observed_at", keyCols = Seq("observed_at"))
  }

  /** One gold batch: recompute candles over the trailing lookback window and
    * replace the touched candle-day partitions (clustered by timeframe, the
    * reference's `cluster_by`).
    */
  def runGold(
      spark: SparkSession, silverDir: String, goldDir: String,
      now: Timestamp = new Timestamp(0L)): Unit = {
    val silver = IncrementalStore.readTable(spark, silverDir)
      .select("observed_at", "open_price", "high_price", "low_price", "close_price")
    val wm = IncrementalStore.highWatermark(spark, goldDir, "candle_start")
    val src = wm match {
      case Some(w) =>
        val start = new Timestamp(w.getTime - LookbackDays * 86400000L)
        silver.filter(col("observed_at") >= lit(start))
      case None => silver
    }
    val batch = ForexPipeline.gold(src).withColumn("dbt_updated_at", lit(now))
    IncrementalStore.overwriteDayPartitions(
      batch, goldDir, tsCol = "candle_start", clusterBy = Seq("timeframe"))
  }
}
