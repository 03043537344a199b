package graft.forex

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gold-model contract tests: the reference's 4 dbt schema tests
  * (models/marts/marts_eurusd.yml:6-21) plus candle invariants (SURVEY §5).
  */
class ForexPipelineSpec extends SparkSpec {

  lazy val silver = ForexPipeline.silverFrom(spark, sf0001).cache()
  lazy val gold = ForexPipeline.gold(silver).cache()

  test("schema test: unique_id is unique and not null") {
    assert(gold.filter(col("unique_id").isNull).count() === 0)
    val dups = gold.groupBy("unique_id").count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("schema test: timeframe within accepted values") {
    val vals = gold.select("timeframe").distinct().collect().map(_.getString(0)).toSet
    assert(vals === Set("5m", "15m", "30m", "1h", "4h", "12h", "24h"))
  }

  test("schema test: candle_start not null") {
    assert(gold.filter(col("candle_start").isNull).count() === 0)
  }

  test("candle invariant: low <= min(open,close) <= max(open,close) <= high") {
    val bad = gold.filter(
      col("low_price") > least(col("open_price"), col("close_price")) ||
      col("high_price") < greatest(col("open_price"), col("close_price"))).count()
    assert(bad === 0)
  }

  test("fan-out conservation: ticks_5m_count sums to silver rows per timeframe") {
    val n = silver.count()
    val sums = gold.groupBy("timeframe").agg(sum("ticks_5m_count").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums.values.toSet === Set(n))
    assert(sums.size === 7)
  }

  test("24h candles are pure-UTC days; 4h candles anchor to 22:00 grid") {
    val bad24 = gold.filter(col("timeframe") === "24h")
      .filter(date_trunc("day", col("candle_start")) =!= col("candle_start")).count()
    assert(bad24 === 0)
    // 4h grid shifted −2h: starts at 22,02,06,10,14,18
    val hours4 = gold.filter(col("timeframe") === "4h")
      .select(hour(col("candle_start"))).distinct().collect().map(_.getInt(0)).toSet
    assert(hours4.subsetOf(Set(22, 2, 6, 10, 14, 18)))
  }

  test("price_diff is null exactly on the first candle per timeframe") {
    val nNull = gold.filter(col("price_diff").isNull).count()
    assert(nNull === 7)
  }

  test("silver dedup keeps one row per observed_at") {
    val dups = silver.groupBy("observed_at").count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("candle rollup from a finer base equals direct aggregation from ticks") {
    // 1h -> {4h, 12h, 24h} (the query's shape) and 5m -> 15m (grid nesting
    // in the sub-hour family)
    def direct(tfs: String*) = Ohlc.candles(
        Resample.fanout(silver, tfs.map(Resample.byName)))
      .collect().map(_.mkString("|")).sorted.toSeq
    val from1h = Ohlc.rollupCandles(
        Ohlc.candles(Resample.fanout(silver, Seq(Resample.byName("1h")))),
        Seq("4h", "12h", "24h").map(Resample.byName))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(from1h === direct("4h", "12h", "24h"))
    val from5m = Ohlc.rollupCandles(
        Ohlc.candles(Resample.fanout(silver, Seq(Resample.byName("5m")))),
        Seq(Resample.byName("15m")))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(from5m === direct("15m"))
  }
}
