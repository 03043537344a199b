package graft.forex

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference pipeline end-to-end, re-expressed as pure
  * `DataFrame => DataFrame` stages over the driver's `events` table
  * (tick-stream proxy: `ts` → observed_at, `value` → price; SURVEY §7.2).
  *
  * Silver (reference: models/staging/stg_eurusd.sql): typed projection +
  * keyed dedup. Gold (reference: models/marts/fct_eurusd_timeframes.sql):
  * 7-timeframe fan-out → OHLC aggregate → indicators + surrogate id.
  *
  * `dbt_updated_at` / `extraction_date` audit columns are added only by the
  * incremental writer (graft.store.IncrementalStore), never here: query
  * outputs must be deterministic for the DuckDB oracle (SURVEY §7.5).
  */
object ForexPipeline {

  /** Silver: events → typed, deduped ticks (stg_eurusd.sql:24-40).
    * Tie-break on duplicate `observed_at` is made deterministic via
    * event_id (SURVEY §5 note on D2's nondeterminism).
    */
  def silver(events: DataFrame): DataFrame = {
    val typed = events.select(
      col("event_id"),
      col("ts").as("observed_at"),
      col("value").as("open_price"),
      col("value").as("high_price"),
      col("value").as("low_price"),
      col("value").as("close_price"))
    Dedup.keyedKeepOne(typed, col("observed_at"), Seq(col("event_id")))
      .drop("event_id")
  }

  /** Gold: silver ticks → per-timeframe candles with indicators
    * (fct_eurusd_timeframes.sql:15-86).
    */
  def gold(silver: DataFrame): DataFrame =
    Indicators.enrich(Ohlc.candles(Resample.fanout(silver)))

  def silverFrom(spark: SparkSession, sfDir: String): DataFrame =
    silver(Tables.events(spark, sfDir))

  def goldFrom(spark: SparkSession, sfDir: String): DataFrame =
    gold(silverFrom(spark, sfDir))
}
