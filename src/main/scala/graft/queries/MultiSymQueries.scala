package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.forex.{ForexPipeline, Resample}

/** Multi-symbol candle pipeline queries (VERDICT r4 item #1).
  *
  * The reference runs one pipeline per symbol (`--symbol`,
  * extract_forex.py:276) and stamps `symbol` on every tick
  * (extract_forex.py:138); a multi-instrument deployment holds all symbols
  * in one table and keys every stage by it. That symbol key is the 100 TB
  * scale dimension: the OHLC aggregate keys on (symbol, timeframe,
  * candle_start) and EVERY window — lag, SMA frames, recursive EWMA —
  * partitions by (symbol, timeframe), so window parallelism is
  * |symbols| × 7 and grows with the instrument universe instead of being
  * pinned at 7. No chunking machinery needed; chunked scans remain the
  * fallback for a single whale series.
  *
  * `event_type` (5 distinct values) is the testdata's symbol proxy.
  * Oracles mirror ForexQueries' CTE builders with `symbol` threaded
  * through every stage.
  */
object MultiSymQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB multi-symbol silver: typed projection + keyed dedup per
    * (symbol, observed_at) — ForexPipeline.silverMulti's twin.
    */
  private[queries] val silverMultiSql: String =
    """silver AS (
      |  SELECT symbol, observed_at, open_price, high_price, low_price, close_price FROM (
      |    SELECT event_type AS symbol, CAST(ts AS TIMESTAMP) AS observed_at,
      |           value AS open_price, value AS high_price,
      |           value AS low_price, value AS close_price,
      |           row_number() OVER (PARTITION BY event_type, CAST(ts AS TIMESTAMP)
      |                              ORDER BY event_id DESC) AS rn
      |    FROM events)
      |  WHERE rn = 1)""".stripMargin

  private def fannedMultiSql(tfs: Seq[Resample.Timeframe]): String = {
    val branches = tfs.map { tf =>
      s"""  SELECT symbol, '${tf.name}' AS timeframe,
         |         ${ForexQueries.bucketSql("observed_at", tf)} AS candle_start,
         |         observed_at, open_price, high_price, low_price, close_price FROM silver""".stripMargin
    }
    "fanned AS (\n" + branches.mkString("\n  UNION ALL\n") + ")"
  }

  private val candlesMultiSql: String =
    """candles AS (
      |  SELECT symbol, timeframe, candle_start,
      |         arg_min(open_price, observed_at) AS open_price,
      |         max(high_price)                  AS high_price,
      |         min(low_price)                   AS low_price,
      |         arg_max(close_price, observed_at) AS close_price,
      |         count(*)                         AS ticks_5m_count
      |  FROM fanned GROUP BY 1, 2, 3)""".stripMargin

  /** Indicators.sma over the (symbol, timeframe) partition key. */
  private def smaMultiSql(n: Int): String = {
    val frame = s"PARTITION BY symbol, timeframe ORDER BY candle_start ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
    val avg = s"""CAST(sum(CAST(close_price AS DECIMAL(25,10))) OVER ($frame) AS DOUBLE)
       |         / count(*) OVER ($frame)""".stripMargin
    graft.Parity.proundSql(avg, 6) + s" AS sma_$n"
  }

  private def indicatorsMultiSql(tfs: Seq[Resample.Timeframe],
      orderBy: String): String =
    s"""WITH $silverMultiSql,
       |${fannedMultiSql(tfs)},
       |$candlesMultiSql
       |SELECT md5(symbol || '|' || timeframe || '|' ||
       |           strftime(candle_start, '%Y-%m-%d %H:%M:%S')) AS unique_id,
       |       symbol, timeframe, candle_start, open_price, high_price, low_price,
       |       close_price, ticks_5m_count,
       |       close_price - lag(close_price) OVER
       |         (PARTITION BY symbol, timeframe ORDER BY candle_start) AS price_diff,
       |       ${smaMultiSql(20)},
       |       ${smaMultiSql(50)}
       |FROM candles
       |ORDER BY $orderBy""".stripMargin

  // ---------------------------------------------------------------- queries

  /** Full multi-symbol gold model: 5 symbols × 7 timeframes, every window
    * partitioned by (symbol, timeframe).
    */
  val fctTimeframesMultisym: Q = (s, dir) =>
    ForexPipeline.goldMultiFrom(s, dir)
      .orderBy(col("symbol"), col("timeframe"), col("candle_start"))

  val fctTimeframesMultisymSql: String =
    indicatorsMultiSql(Resample.timeframes, "symbol, timeframe, candle_start")

  /** Indicator stage per symbol over 1h candles. */
  val indicatorsMultisym: Q = (s, dir) => {
    val key = Seq("symbol")
    val silver = ForexPipeline.silverMultiFrom(s, dir)
    val fanned = Resample.fanout(silver, Seq(Resample.byName("1h")), key)
    graft.forex.Indicators.enrich(
        graft.forex.Ohlc.candles(fanned, key), key)
      .orderBy(col("symbol"), col("candle_start"))
  }

  val indicatorsMultisymSql: String =
    indicatorsMultiSql(Seq(Resample.byName("1h")), "symbol, candle_start")

  /** Recursive EWMA per symbol — the prefix-fold recurrence of ewma_1h with
    * the fold window partitioned by symbol: recursion parallelizes across
    * symbols with no reassociation (each symbol's fold is the sequential
    * association, so the oracle is the same fold per partition).
    */
  val ewmaMultisym: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val key = Seq("symbol")
    val candles = graft.forex.Ohlc.candles(
        Resample.fanout(ForexPipeline.silverMultiFrom(s, dir),
          Seq(Resample.byName("1h")), key), key)
      .select(col("symbol"), col("candle_start"), col("close_price"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("candle_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    candles
      .withColumn("px", collect_list(col("close_price")).over(w))
      .select(col("symbol"), col("candle_start"), col("close_price"),
        graft.Parity.pround(
          expr("aggregate(slice(px, 2, size(px) - 1), px[0], (acc, x) -> 0.2 * x + 0.8 * acc)"),
          6).as("ewma"))
      .orderBy(col("symbol"), col("candle_start"))
  }

  val ewmaMultisymSql: String =
    s"""WITH $silverMultiSql,
       |c AS (
       |  SELECT symbol,
       |         ${ForexQueries.bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_max(close_price, observed_at) AS close_price
       |  FROM silver GROUP BY 1, 2),
       |pre AS (
       |  SELECT symbol, candle_start, close_price,
       |         list(close_price) OVER (PARTITION BY symbol ORDER BY candle_start
       |           ROWS UNBOUNDED PRECEDING) AS px
       |  FROM c)
       |SELECT symbol, candle_start, close_price,
       |       ${graft.Parity.proundSql("list_reduce(px, (acc, x) -> 0.2 * x + 0.8 * acc)", 6)} AS ewma
       |FROM pre ORDER BY symbol, candle_start""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "fct_timeframes_multisym" -> fctTimeframesMultisym,
    "indicators_multisym" -> indicatorsMultisym,
    "ewma_multisym" -> ewmaMultisym)

  val oracleSql: Map[String, String] = Map(
    "fct_timeframes_multisym" -> fctTimeframesMultisymSql,
    "indicators_multisym" -> indicatorsMultisymSql,
    "ewma_multisym" -> ewmaMultisymSql)
}
