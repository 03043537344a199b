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

  // ------------------------------------------------------------ multi-symbol

  /** Multi-symbol silver: the reference parameterizes one run per symbol
    * (`--symbol`, extract_forex.py:276) and stamps the `symbol` column on
    * every tick (extract_forex.py:138); a multi-instrument deployment holds
    * them all in ONE table keyed by symbol. `event_type` is the testdata's
    * symbol proxy (5 distinct values). Dedup key becomes (symbol,
    * observed_at) — still one shuffle.
    */
  def silverMulti(events: DataFrame): DataFrame = {
    val typed = events.select(
      col("event_id"),
      col("event_type").as("symbol"),
      col("ts").as("observed_at"),
      col("value").as("open_price"),
      col("value").as("high_price"),
      col("value").as("low_price"),
      col("value").as("close_price"))
    Dedup.keyedKeepOne(typed, Seq(col("symbol"), col("observed_at")),
        Seq(col("event_id")))
      .drop("event_id")
  }

  /** Multi-symbol gold: same stages with `symbol` threaded through — the
    * OHLC aggregate keys on (symbol, timeframe, candle_start) and every
    * indicator window partitions by (symbol, timeframe), so window
    * parallelism is |symbols|×7 and grows with the instrument universe
    * (VERDICT r4 item #1: the 100 TB partition key).
    */
  def goldMulti(silver: DataFrame): DataFrame = {
    val key = Seq("symbol")
    Indicators.enrich(
      Ohlc.candles(Resample.fanout(silver, keyCols = key), keyCols = key),
      keyCols = key)
  }

  def silverMultiFrom(spark: SparkSession, sfDir: String): DataFrame =
    silverMulti(Tables.events(spark, sfDir))

  def goldMultiFrom(spark: SparkSession, sfDir: String): DataFrame =
    goldMulti(silverMultiFrom(spark, sfDir))
}
