package graft.forex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OHLC candle aggregation (reference: fct_eurusd_timeframes.sql:59-71).
  *
  * open  = price at earliest tick in the candle — the reference's
  *         `array_agg(open_price ORDER BY observed_at ASC LIMIT 1)[OFFSET(0)]`
  *         idiom (line 63) is Spark's `min_by`;
  * close = price at latest tick (line 66) → `max_by`;
  * high/low/count are plain aggregates (lines 64-65,68).
  *
  * One hash aggregate: partial (map-side) combine happens automatically, so
  * at scale this shuffles only one pre-aggregated row per
  * (timeframe, candle_start) per input partition. `min_by`/`max_by` are
  * deterministic here because silver is deduped on `observed_at` first
  * (Dedup.keyedKeepOne), so there are no order ties inside a candle.
  */
object Ohlc {

  def candles(fanned: DataFrame): DataFrame =
    fanned
      .groupBy(col("timeframe"), col("candle_start"))
      .agg(
        min_by(col("open_price"), col("observed_at")).as("open_price"),
        max(col("high_price")).as("high_price"),
        min(col("low_price")).as("low_price"),
        max_by(col("close_price"), col("observed_at")).as("close_price"),
        count(lit(1)).as("ticks_5m_count"))
}
