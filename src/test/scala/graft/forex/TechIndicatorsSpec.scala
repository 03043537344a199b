package graft.forex

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Indicator-math invariants for TechIndicators (the oracle asserts
  * cross-engine bit-parity; these assert the math itself on a tiny
  * hand-checkable series).
  */
class TechIndicatorsSpec extends SparkSpec {

  private def candles(prices: Double*) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("candle_start",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("close_price",
        org.apache.spark.sql.types.DoubleType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = prices.zipWithIndex.map { case (p, i) =>
      Row(new java.sql.Timestamp(base + i * 3600000L), p)
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  test("bollinger: constant series has zero-width bands equal to the price") {
    val rows = TechIndicators.bollinger(candles(Seq.fill(25)(1.5): _*), n = 20)
      .collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      assert(r.getAs[Double]("bb_mid") === 1.5)
      assert(r.getAs[Double]("bb_upper") === 1.5)
      assert(r.getAs[Double]("bb_lower") === 1.5)
    }
  }

  test("bollinger: bands symmetric around mid, upper >= mid >= lower") {
    val rows = TechIndicators.bollinger(
      candles(1.0, 2.0, 3.0, 2.0, 1.0, 4.0, 2.5), n = 5).collect()
    rows.foreach { r =>
      val (mid, up, lo) = (r.getAs[Double]("bb_mid"),
        r.getAs[Double]("bb_upper"), r.getAs[Double]("bb_lower"))
      assert(up >= mid && mid >= lo)
      assert(math.abs((up - mid) - (mid - lo)) < 1e-9)
    }
  }

  test("rsi: monotone rise gives 100, monotone fall gives 0, bounded [0,100]") {
    val up = TechIndicators.rsi(candles((1 to 20).map(_.toDouble): _*)).collect()
    assert(up.length === 19) // first row has no diff
    up.foreach(r => assert(r.getAs[Double]("rsi_14") === 100.0))
    val down = TechIndicators.rsi(candles((20 to 1 by -1).map(_.toDouble): _*))
      .collect()
    down.foreach(r => assert(r.getAs[Double]("rsi_14") === 0.0))
    val mixed = TechIndicators.rsi(
      candles(1.0, 2.0, 1.5, 1.8, 1.2, 2.2, 2.0, 1.9)).collect()
    mixed.foreach { r =>
      val v = r.getAs[Double]("rsi_14")
      assert(v >= 0.0 && v <= 100.0)
    }
  }

  test("macd: constant series is identically zero; first row is zero") {
    val rows = TechIndicators.macd(candles(Seq.fill(30)(2.0): _*)).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("macd") === 0.0)
      assert(r.getAs[Double]("macd_signal") === 0.0)
      assert(r.getAs[Double]("macd_hist") === 0.0)
    }
    // on any series the first row's EMAs all seed at close -> macd = 0
    val any = TechIndicators.macd(candles(5.0, 1.0, 9.0, 2.0))
      .orderBy("candle_start").collect()
    assert(any.head.getAs[Double]("macd") === 0.0)
    assert(any.head.getAs[Double]("macd_signal") === 0.0)
  }

  test("ewma chunked scan tracks the sequential fold to float noise") {
    // 300 hourly closes across many 64-candle chunks
    val prices = (0 until 300).map(i => 1.0 + 0.3 * math.sin(i / 7.0) + 0.01 * (i % 13))
    val df = candles(prices: _*)
    val chunked = TechIndicators.ewmaChunked(df)
      .orderBy("candle_start").collect().map(_.getAs[Double]("ewma"))
    assert(chunked.length === 300)
    // sequential reference recurrence
    val seq = prices.tail.scanLeft(prices.head)((acc, x) => 0.8 * acc + 0.2 * x)
      .map(v => math.floor(v * 1e6 + 0.5) / 1e6)
    chunked.zip(seq).zipWithIndex.foreach { case ((c, s), i) =>
      assert(math.abs(c - s) <= 1e-6 + 1e-9, s"row $i: chunked=$c seq=$s")
    }
    // first row: ewma seeds at the first close exactly
    assert(chunked.head === math.floor(prices.head * 1e6 + 0.5) / 1e6)
  }

  test("ewma chunked is invariant to chunk width (up to rounding grain)") {
    val prices = (0 until 200).map(i => 1.2 + 0.05 * ((i * 37) % 11))
    val df = candles(prices: _*)
    val a = TechIndicators.ewmaChunked(df, candlesPerChunk = 16)
      .orderBy("candle_start").collect().map(_.getAs[Double]("ewma"))
    val b = TechIndicators.ewmaChunked(df, candlesPerChunk = 128)
      .orderBy("candle_start").collect().map(_.getAs[Double]("ewma"))
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) <= 1e-6 + 1e-9) }
  }

  test("ewma chunked at 150 chunks: hierarchical scan is bit-equal across " +
      "8-vs-64 shuffle partitions and tracks the sequential fold") {
    // 600 candles at 4 candles/chunk = 150 chunks > fanout 64, so the
    // MonoidScan recursion genuinely goes two levels deep; the association
    // is keyed by the ck grid, never by physical partitioning, so results
    // must be BIT-identical under any partition count (VERDICT r12 item 1)
    val prices = (0 until 600).map(i => 1.0 + 0.25 * math.sin(i / 11.0) + 0.02 * ((i * 29) % 17))
    val runAt = (parts: Int, inputParts: Int) => {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try TechIndicators.ewmaChunked(
          candles(prices: _*).repartition(inputParts), candlesPerChunk = 4)
        .orderBy("candle_start").collect().map(_.getAs[Double]("ewma"))
      finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    val at8 = runAt(8, 8)
    val at64 = runAt(64, 3)
    assert(at8.length === 600)
    at8.zip(at64).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a === b, s"row $i: partitions must not change bits")
    }
    // the hierarchy reassociates vs the flat recurrence only at ulp level
    val seq = prices.tail.scanLeft(prices.head)((acc, x) => 0.8 * acc + 0.2 * x)
      .map(v => math.floor(v * 1e6 + 0.5) / 1e6)
    at8.zip(seq).zipWithIndex.foreach { case ((c, s), i) =>
      assert(math.abs(c - s) <= 1e-6 + 1e-9, s"row $i: chunked=$c seq=$s")
    }
  }

  test("bollinger chunked at 150 chunks stays bit-equal to the global window") {
    // the r13 bounded carry frame (ROWS -19..-1 over chunk rows) must keep
    // frame CONTENTS identical to the unbounded accumulation at any depth
    val prices = (0 until 600).map(i => 1.0 + 0.4 * math.sin(i / 3.0) + 0.02 * ((i * 31) % 9))
    val df = candles(prices: _*)
    val global = TechIndicators.bollinger(df).orderBy("candle_start").collect()
    val chunked = TechIndicators.bollingerChunked(df, candlesPerChunk = 4)
      .orderBy("candle_start").collect()
    assert(chunked.length === global.length)
    chunked.zip(global).zipWithIndex.foreach { case ((c, g), i) =>
      Seq("bb_mid", "bb_upper", "bb_lower").foreach { f =>
        assert(c.getAs[Double](f) === g.getAs[Double](f), s"row $i $f")
      }
    }
  }

  test("rsi chunked scan tracks the sequential Wilder fold to float noise") {
    val prices = (0 until 250).map(i => 1.0 + 0.2 * math.sin(i / 5.0) + 0.03 * ((i * 17) % 7))
    val df = candles(prices: _*)
    val seq = TechIndicators.rsi(df).orderBy("candle_start")
      .collect().map(_.getAs[Double]("rsi_14"))
    val chunked = TechIndicators.rsiChunked(df).orderBy("candle_start")
      .collect().map(_.getAs[Double]("rsi_14"))
    assert(chunked.length === seq.length)
    chunked.zip(seq).zipWithIndex.foreach { case ((c, s), i) =>
      assert(math.abs(c - s) <= 1e-5, s"row $i: chunked=$c seq=$s")
    }
  }

  test("macd chunked scans track the sequential folds to float noise") {
    val prices = (0 until 250).map(i => 1.0 + 0.2 * math.sin(i / 9.0) + 0.02 * ((i * 23) % 5))
    val df = candles(prices: _*)
    val seq = TechIndicators.macd(df).orderBy("candle_start").collect()
    val chunked = TechIndicators.macdChunked(df).orderBy("candle_start").collect()
    assert(chunked.length === seq.length)
    chunked.zip(seq).zipWithIndex.foreach { case ((c, s), i) =>
      Seq("macd", "macd_signal", "macd_hist").foreach { f =>
        assert(math.abs(c.getAs[Double](f) - s.getAs[Double](f)) <= 1e-5,
          s"row $i $f: chunked=${c.getAs[Double](f)} seq=${s.getAs[Double](f)}")
      }
    }
  }

  test("bollinger chunked equals the global window BIT-EXACTLY across chunk widths") {
    // frame lists are identical, so this is exact equality, not tolerance —
    // tiny chunks make every frame cross a boundary (carry-in exercised)
    val prices = (0 until 150).map(i => 1.0 + 0.4 * math.sin(i / 3.0) + 0.02 * ((i * 31) % 9))
    val df = candles(prices: _*)
    val global = TechIndicators.bollinger(df).orderBy("candle_start").collect()
    Seq(4, 16, 1 << 20).foreach { cpc =>
      val chunked = TechIndicators.bollingerChunked(df, candlesPerChunk = cpc)
        .orderBy("candle_start").collect()
      assert(chunked.length === global.length, s"cpc=$cpc")
      chunked.zip(global).zipWithIndex.foreach { case ((c, g), i) =>
        Seq("bb_mid", "bb_upper", "bb_lower").foreach { f =>
          assert(c.getAs[Double](f) === g.getAs[Double](f),
            s"cpc=$cpc row $i $f: chunked=${c.getAs[Double](f)} global=${g.getAs[Double](f)}")
        }
      }
    }
  }

  test("chunked diff equals the global lag exactly (boundary rows patched from carry)") {
    val prices = (0 until 100).map(i => 2.0 + 0.1 * ((i * 13) % 17))
    val df = candles(prices: _*)
    val diffs = TechIndicators.diffChunked(df, candlesPerChunk = 8, gridUs = 3600000000L)
      .orderBy("candle_start").collect()
      .map(r => Option(r.getAs[java.lang.Double]("diff")).map(_.toDouble))
    assert(diffs.length === 100)
    assert(diffs.head.isEmpty) // series' first row has no predecessor
    diffs.tail.zipWithIndex.foreach { case (d, i) =>
      assert(d.contains(prices(i + 1) - prices(i)), s"row ${i + 1}")
    }
  }

  test("degenerate series: single-row and empty inputs never throw") {
    val one = candles(1.5)
    assert(TechIndicators.bollinger(one).collect().length === 1)
    assert(TechIndicators.rsi(one).collect().length === 0) // no diff -> no row
    assert(TechIndicators.macd(one).collect().length === 1)
    assert(TechIndicators.ewmaChunked(one).collect().length === 1)
    assert(TechIndicators.rsiChunked(one).collect().length === 0)
    assert(TechIndicators.macdChunked(one).collect().length === 1)
    val empty = candles()
    assert(TechIndicators.bollinger(empty).collect().isEmpty)
    assert(TechIndicators.rsi(empty).collect().isEmpty)
    assert(TechIndicators.macd(empty).collect().isEmpty)
  }

  test("macd: hist = macd - signal (after shared rounding)") {
    val rows = TechIndicators.macd(
      candles(1.0, 1.2, 1.1, 1.4, 1.3, 1.8, 1.6, 1.9, 2.1, 1.7)).collect()
    rows.foreach { r =>
      val (m, s, h) = (r.getAs[Double]("macd"),
        r.getAs[Double]("macd_signal"), r.getAs[Double]("macd_hist"))
      assert(math.abs(h - (m - s)) < 2e-6) // independent roundings of each
    }
  }
}
