package graft.forex

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The chunked indicator path must equal the declarative window path
  * bit-for-bit — including across chunk boundaries, which is where all the
  * carry-in logic lives (tiny chunks force hundreds of boundaries).
  */
class IndicatorsChunkedSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(
        col("unique_id"), col("timeframe"), col("candle_start"),
        col("open_price"), col("high_price"), col("low_price"),
        col("close_price"), col("ticks_5m_count"), col("price_diff"),
        col("sma_20"), col("sma_50"))
      .collect().map(_.mkString("|")).sorted.toSeq

  private lazy val candles =
    Ohlc.candles(Resample.fanout(ForexPipeline.silverFrom(spark, sf0001)))

  private lazy val declarative = canon(Indicators.enrich(candles))

  test("chunked enrich equals window enrich with boundary-heavy tiny chunks") {
    // 8 grid slots per chunk: every sma_50 frame spans several chunks, so
    // carries must accumulate tails across sparse chunks to stay correct
    val chunked = canon(IndicatorsChunked.enrich(candles, candlesPerChunk = 8))
    assert(chunked.nonEmpty)
    assert(chunked === declarative)
  }

  test("chunked enrich equals window enrich with one big chunk (no carries)") {
    val chunked = canon(IndicatorsChunked.enrich(candles, candlesPerChunk = 1 << 20))
    assert(chunked === declarative)
  }
}
