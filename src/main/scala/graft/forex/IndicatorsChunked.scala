package graft.forex

import java.math.{BigDecimal => JBD, RoundingMode}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Scale-out variant of [[Indicators.enrich]] — the mitigation for the
  * "window partitioned by timeframe = 7 partitions" ceiling (README).
  *
  * `Indicators.enrich` gives one window partition per timeframe, so a
  * timeframe's whole candle history must sort through a single task. Here
  * the series is split into TIME-CONTIGUOUS CHUNKS (≤ `candlesPerChunk`
  * grid slots each), and each chunk is enriched independently after
  * receiving a bounded carry-in: the ≤50 rows preceding it (50 = the widest
  * ROWS frame; n-row frames and lag(1) can never see further back). The
  * carry-in tails are assembled with one aggregation job plus one bounded
  * driver collect (≤50 rows per non-empty chunk — chunk COUNT many, never
  * row data at scale), then broadcast.
  *
  * Parallelism becomes #chunks (grows with data span), per-task memory is
  * bounded by `candlesPerChunk + 50` rows by construction — no whale
  * partition possible. Every numeric step replicates the declarative path
  * bit-for-bit: close quantized like CAST(double AS DECIMAL(25,10))
  * (shortest-repr BigDecimal, HALF_UP at scale 10), exact running frame
  * sums, double division by the frame row count, the same
  * floor(x·1e6+0.5)/1e6 rounding — proven by sharing the declarative
  * query's DuckDB oracle and by the equality spec.
  */
object IndicatorsChunked {

  final case class CandleRow(
      timeframe: String, candle_start: Timestamp,
      open_price: Double, high_price: Double, low_price: Double,
      close_price: Double, ticks_5m_count: Long)

  final case class EnrichedRow(
      timeframe: String, candle_start: Timestamp,
      open_price: Double, high_price: Double, low_price: Double,
      close_price: Double, ticks_5m_count: Long,
      price_diff: Option[Double], sma_20: Double, sma_50: Double)

  /** Widest ROWS frame (sma_50); no indicator sees further back. */
  private val MaxCarry = 50

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Exactly Spark's CAST(double AS DECIMAL(25,10)): shortest decimal
    * representation, then HALF_UP at scale 10.
    */
  private def dec10(d: Double): JBD =
    JBD.valueOf(d).setScale(10, RoundingMode.HALF_UP)

  private def pround6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Chunk id: time-contiguous buckets of the candle grid. `baseWidthUs` is
    * the FINEST grid the input can contain (5m for the forex timeframes), so
    * any coarser timeframe puts strictly fewer rows in a chunk and the
    * per-task bound holds for all of them.
    */
  private def chunkId(tsUs: Long, candlesPerChunk: Int, baseWidthUs: Long): Long =
    Math.floorDiv(tsUs, baseWidthUs * candlesPerChunk)

  def enrich(
      candles: DataFrame,
      candlesPerChunk: Int = 4096,
      baseWidthUs: Long = 300000000L): DataFrame = {
    val spark = candles.sparkSession
    import spark.implicits._

    implicit val candleEnc = Encoders.product[CandleRow]
    implicit val keyEnc = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    implicit val outEnc = Encoders.product[EnrichedRow]

    val typed = candles.select(
      col("timeframe"), col("candle_start"), col("open_price"),
      col("high_price"), col("low_price"), col("close_price"),
      col("ticks_5m_count").cast("long").as("ticks_5m_count")).as[CandleRow]

    val cpc = candlesPerChunk

    // Pass 1 — per-chunk tails: the last ≤50 (ts, close) of every non-empty
    // chunk. Partial collect_lists are bounded by the chunk row cap; the
    // driver sees chunk-count × 50 rows, never the series.
    val tailRows = typed.toDF()
      .withColumn("chunk_id",
        // integer DIV, not floor(a/b): double division can misround at the
        // exact chunk boundary; positive epochs make DIV == floorDiv
        expr(s"unix_micros(candle_start) DIV ${baseWidthUs * candlesPerChunk}L"))
      .groupBy(col("timeframe"), col("chunk_id"))
      .agg(expr(
        s"reverse(slice(reverse(array_sort(collect_list(struct(candle_start, close_price)))), 1, $MaxCarry))")
        .as("tail"))
      .collect()

    // Driver assembly: carry(chunk) = last ≤50 rows of ALL preceding chunks
    // of that timeframe (a sparse previous chunk may hold <50 rows, so tails
    // accumulate across chunks until 50 are in hand).
    val carries: Map[(String, Long), Array[(Long, Double)]] = {
      val byTf = tailRows
        .map { r =>
          val tf = r.getString(0)
          val chunk = r.getLong(1)
          val tail = r.getSeq[org.apache.spark.sql.Row](2)
            .map(t => (micros(t.getTimestamp(0)), t.getDouble(1))).toArray
          (tf, chunk, tail)
        }
        .groupBy(_._1)
      byTf.flatMap { case (tf, rows) =>
        var acc = Array.empty[(Long, Double)]
        rows.sortBy(_._2).map { case (_, chunk, tail) =>
          val carry = ((tf, chunk), acc)
          acc = (acc ++ tail).takeRight(MaxCarry)
          carry
        }
      }
    }
    val carriesB = spark.sparkContext.broadcast(carries)

    // Pass 2 — enrich each chunk independently with its carry-in.
    val enriched = typed
      .groupByKey(r => (r.timeframe, chunkId(micros(r.candle_start), cpc, baseWidthUs)))
      .flatMapGroups { (key: (String, Long), it: Iterator[CandleRow]) =>
        val rows = it.toArray.sortBy(r => micros(r.candle_start)) // ≤ cpc rows
        val carry = carriesB.value.getOrElse(key, Array.empty)
        // frame state seeded from the carry: window holds the last ≤50
        // closes; running exact-decimal sums maintained add/evict
        val window = scala.collection.mutable.ArrayDeque[JBD]()
        var sum50 = JBD.ZERO
        var sum20 = JBD.ZERO
        carry.foreach { case (_, c) =>
          val d = dec10(c)
          window.append(d); sum50 = sum50.add(d); sum20 = sum20.add(d)
          if (window.length > 20) sum20 = sum20.subtract(window(window.length - 21))
        }
        var prevClose: Option[Double] = carry.lastOption.map(_._2)
        var seen = carry.length.toLong // = min(50, total preceding rows)
        rows.iterator.map { r =>
          val d = dec10(r.close_price)
          window.append(d); sum50 = sum50.add(d); sum20 = sum20.add(d)
          if (window.length > 20) sum20 = sum20.subtract(window(window.length - 21))
          if (window.length > MaxCarry) { sum50 = sum50.subtract(window.removeHead()) }
          seen += 1L
          val c50 = math.min(MaxCarry.toLong, seen)
          val c20 = math.min(20L, seen)
          val out = EnrichedRow(
            r.timeframe, r.candle_start, r.open_price, r.high_price,
            r.low_price, r.close_price, r.ticks_5m_count,
            prevClose.map(p => r.close_price - p),
            pround6(sum20.doubleValue() / c20),
            pround6(sum50.doubleValue() / c50))
          prevClose = Some(r.close_price)
          out
        }
      }

    enriched.toDF()
      .withColumn("unique_id", Indicators.uniqueId())
      .select(
        col("unique_id"), col("timeframe"), col("candle_start"),
        col("open_price"), col("high_price"), col("low_price"), col("close_price"),
        col("ticks_5m_count"), col("price_diff"), col("sma_20"), col("sma_50"))
  }
}
