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
    assert(q.awaitTermination(120000), "stream must drain before asserting")

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
    assert(q.awaitTermination(120000), "stream must drain before asserting")
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
    assert(q.awaitTermination(120000), "stream must drain before asserting")
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

  test("checkpoint recovery: a restarted stream resumes from state and stays exactly-once") {
    // stream_to_store argues at-least-once replay × idempotent MERGE =
    // exactly-once table contents; this proves the restart half (VERDICT
    // r4 item #5). Phase A drains a time-prefix of the source and
    // terminates — the deterministic stand-in for a crash mid-source (the
    // stream saw a prefix; the rest arrives while it is down). Phase B
    // restarts from the SAME checkpoint with the remaining files present.
    val in = Files.createTempDirectory("graft_ckpt_in").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = Files.createTempDirectory("graft_ckpt_store").toString
    val tf = Resample.byName("1h")
    val silver = ForexPipeline.silverFrom(spark, sf0001).cache()
    val bounds = silver.agg(min(col("observed_at")), max(col("observed_at"))).first()
    val mid = new java.sql.Timestamp(
      (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
    val part1 = silver.filter(col("observed_at") <= lit(mid))
    val part2 = silver.filter(col("observed_at") > lit(mid))
    part1.write.mode("overwrite").parquet(in)

    def run(): Long = {
      val q = ForexStream.writeToStore(
          ForexStream.candlesComplete(ForexStream.ticks(spark, in), tf), store)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream must drain before asserting")
      q.recentProgress.map(_.numInputRows).sum
    }

    val rows1 = run()
    assert(rows1 === part1.count(), "first run consumes exactly the prefix")
    assert(IncrementalStore.readTable(spark, store).count() > 0,
      "the interrupted run leaves a valid partial store")

    part2.write.mode("append").parquet(in)
    val rows2 = run()
    // resume, not reprocess: the checkpoint remembers part1's files, so the
    // restart reads only the new ones...
    assert(rows2 === part2.count(),
      s"restart must read only the new files (read $rows2, expected ${part2.count()})")

    // ...and the recovered aggregation state makes candles spanning the
    // split boundary correct, while replayed upserts stay idempotent: the
    // store equals the batch answer over the full input, bit for bit.
    val cols = Seq("timeframe", "candle_start", "open_price", "high_price",
      "low_price", "close_price", "ticks_5m_count")
    val got = IncrementalStore.readTable(spark, store)
      .select(cols.map(col): _*).collect().map(_.mkString("|")).sorted
    val want = Ohlc.candles(Resample.fanout(silver, Seq(tf)))
      .select(cols.map(col): _*).collect().map(_.mkString("|")).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("foreachBatch sink: streamed candles land in the incremental store") {
    val dir = silverDir()
    val out = Files.createTempDirectory("graft_stream_out").toString
    val tf = Resample.byName("1h")
    val q = ForexStream.writeToStore(
        ForexStream.candles(ForexStream.ticks(spark, dir), tf), out)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000), "stream must drain before asserting")
    val stored = IncrementalStore.readTable(spark, out)
    assert(stored.count() > 0)
    assert(stored.select("timeframe").distinct().first().getString(0) === "1h")
    // store key is unique
    assert(stored.groupBy("timeframe", "candle_start").count()
      .filter(col("count") > 1).count() === 0)
  }
}
