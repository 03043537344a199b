package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.forex.{ForexPipeline, Ohlc, Resample}
import graft.store.IncrementalStore

/** Streaming/batch equivalence: the streaming OHLC over a bounded file
  * stream must produce the same candles as the batch path (SURVEY §2.10 —
  * the reference's daily cron is exactly a bounded micro-batch stream).
  */
class ForexStreamSpec extends SparkSpec {

  private def silverDir(): String = {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    ForexPipeline.silverFrom(spark, sf0001)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming 1h candles equal batch 1h candles (memory sink, AvailableNow)") {
    val dir = silverDir()
    val tf = Resample.byName("1h")
    val q = ForexStream.candles(ForexStream.ticks(spark, dir), tf)
      .writeStream.format("memory").queryName("stream_1h")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stream_1h")
      .select("timeframe", "candle_start", "open_price", "high_price",
        "low_price", "close_price", "ticks_5m_count")
      .collect().map(_.mkString("|")).sorted

    val batch = Ohlc.candles(
        Resample.fanout(ForexPipeline.silverFrom(spark, sf0001), Seq(tf)))
      .select("timeframe", "candle_start", "open_price", "high_price",
        "low_price", "close_price", "ticks_5m_count")
      .collect().map(_.mkString("|")).sorted

    // AvailableNow + append: all windows are finalized except those beyond
    // the final watermark — with a bounded input the last window(s) may be
    // withheld, so streamed ⊆ batch and covers all but the tail.
    assert(streamed.nonEmpty)
    assert(streamed.toSet.subsetOf(batch.toSet),
      "streamed candles must be a subset of batch candles")
    assert(streamed.length >= batch.length - 2,
      s"streamed ${streamed.length} vs batch ${batch.length}")
  }

  test("4h anchor: streaming window starts match the -2h shifted grid") {
    val dir = silverDir()
    val tf = Resample.byName("4h")
    val q = ForexStream.candles(ForexStream.ticks(spark, dir), tf)
      .writeStream.format("memory").queryName("stream_4h")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val hours = spark.table("stream_4h")
      .select(hour(col("candle_start"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(hours.nonEmpty && hours.subsetOf(Set(22, 2, 6, 10, 14, 18)), s"got $hours")
  }

  test("watermark-bounded streaming dedup keeps one tick per observed_at") {
    val dir = silverDir()
    // duplicate the whole input in a second file batch: every key now has
    // cross-micro-batch duplicates within the lateness window
    ForexPipeline.silverFrom(spark, sf0001)
      .write.mode("append").parquet(dir)
    val q = ForexStream.dedupedTicks(ForexStream.ticks(spark, dir))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_stream")
    val batch = ForexPipeline.silverFrom(spark, sf0001)
    assert(out.count() === batch.count(),
      "each observed_at must survive exactly once despite duplicated input")
    assert(out.groupBy("observed_at").count().filter(col("count") > 1).count() === 0)
  }

  test("sliding windows: every tick lands in width/slide overlapping windows") {
    val dir = silverDir()
    val q = ForexStream.slidingCandles(ForexStream.ticks(spark, dir))
      .writeStream.format("memory").queryName("sliding_stream")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000),
      "stream must drain before asserting on the memory sink")
    val out = spark.table("sliding_stream")
    val ticks = ForexPipeline.silverFrom(spark, sf0001)
    // total window membership = 4 x tick count (1h width / 15m slide)
    assert(out.agg(sum("ticks_5m_count")).first().getLong(0) === ticks.count() * 4)
    // window starts are on the 15-minute slide grid
    assert(out.filter(expr("CAST(window_start AS LONG) % 900 != 0")).count() === 0)
    // each 1h-aligned sliding window equals the tumbling 1h candle
    val tumbling = Ohlc.candles(Resample.fanout(ticks, Seq(Resample.byName("1h"))))
      .select("candle_start", "open_price", "close_price", "ticks_5m_count")
      .collect().map(_.mkString("|")).sorted
    val aligned = out.filter(expr("CAST(window_start AS LONG) % 3600 = 0"))
      .select(col("window_start").as("candle_start"), col("open_price"),
        col("close_price"), col("ticks_5m_count"))
      .collect().map(_.mkString("|")).sorted
    assert(aligned.toSeq === tumbling.toSeq)
  }

  test("foreachBatch sink: streamed candles land in the incremental store") {
    val dir = silverDir()
    val out = Files.createTempDirectory("graft_stream_out").toString
    val tf = Resample.byName("1h")
    val q = ForexStream.writeToStore(
        ForexStream.candles(ForexStream.ticks(spark, dir), tf), out)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val stored = IncrementalStore.readTable(spark, out)
    assert(stored.count() > 0)
    assert(stored.select("timeframe").distinct().first().getString(0) === "1h")
    // store key is unique
    assert(stored.groupBy("timeframe", "candle_start").count()
      .filter(col("count") > 1).count() === 0)
  }
}
