package graft.model

import java.sql.Timestamp

/** Typed row models for the forex pipeline layers.
  *
  * Mirrors the reference's three-layer medallion data model
  * (reference: models/staging/stg_eurusd.sql:24-40,
  * models/marts/fct_eurusd_timeframes.sql:59-86) re-expressed as Spark
  * case classes (used with `Dataset[T]` in tests; production paths stay
  * DataFrame for schema flexibility).
  */
object Schemas {

  /** Bronze tick as extracted (reference: scripts/extract_forex.py:52-61,137-139). */
  final case class RawTick(
      datetime: Timestamp,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      symbol: String)

  /** Silver typed/deduped tick (reference: models/staging/stg_eurusd.sql:24-40). */
  final case class Tick(
      observed_at: Timestamp,
      open_price: Double,
      high_price: Double,
      low_price: Double,
      close_price: Double)

  /** Gold candle row (reference: models/marts/fct_eurusd_timeframes.sql:59-86). */
  final case class Candle(
      unique_id: String,
      timeframe: String,
      candle_start: Timestamp,
      open_price: Double,
      high_price: Double,
      low_price: Double,
      close_price: Double,
      ticks_5m_count: Long,
      price_diff: Option[Double],
      sma_20: Double,
      sma_50: Double)
}
