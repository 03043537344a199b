package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.forex.{Dedup, ForexPipeline, Indicators, IndicatorsChunked, Ohlc, Resample}

/** Driver-contract queries covering the reference pipeline (SURVEY §2),
  * each with a DuckDB oracle over the same parquet tables.
  *
  * Oracle-parity rules (SURVEY §7.4/§7.5):
  *  - events.ts is dual-schema at the Bronze boundary (ns-long or µs
  *    timestamp — see Tables.scala's contract): Spark normalizes to µs
  *    TimestampType, DuckDB `CAST(ts AS TIMESTAMP)` lands on the same µs
  *    value for every supported layout (ns→µs truncation for positive
  *    epochs, identity for µs);
  *  - every aggregate/computed column is aliased to the same name on both
  *    sides (driver sorts columns by name before hashing);
  *  - every output has a total ORDER BY on both sides;
  *  - float aggregates whose summation order is engine-dependent are rounded
  *    identically on both sides.
  */
object ForexQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB equivalent of the silver model (shared CTE text). */
  private[queries] val silverSql: String =
    """silver AS (
      |  SELECT observed_at, open_price, high_price, low_price, close_price FROM (
      |    SELECT CAST(ts AS TIMESTAMP) AS observed_at,
      |           value AS open_price, value AS high_price,
      |           value AS low_price, value AS close_price,
      |           row_number() OVER (PARTITION BY CAST(ts AS TIMESTAMP)
      |                              ORDER BY event_id DESC) AS rn
      |    FROM events)
      |  WHERE rn = 1)""".stripMargin

  /** DuckDB bucket expression mirroring Resample.bucket's closed form. */
  private[queries] def bucketSql(tsCol: String, tf: Resample.Timeframe): String = {
    val u = s"(epoch_us($tsCol) + ${tf.shiftUs})"
    s"make_timestamp($u - ($u % ${tf.widthUs}) - ${tf.shiftUs})"
  }

  private[queries] val fannedSql: String = {
    val branches = Resample.timeframes.map { tf =>
      s"""  SELECT '${tf.name}' AS timeframe, ${bucketSql("observed_at", tf)} AS candle_start,
         |         observed_at, open_price, high_price, low_price, close_price FROM silver""".stripMargin
    }
    "fanned AS (\n" + branches.mkString("\n  UNION ALL\n") + ")"
  }

  /** DuckDB SMA mirroring Indicators.sma: exact DECIMAL frame sum → double
    * → divide by frame count → round. Association-independent on both sides.
    */
  private[queries] def smaSql(n: Int): String = {
    val frame = s"PARTITION BY timeframe ORDER BY candle_start ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
    val avg = s"""CAST(sum(CAST(close_price AS DECIMAL(25,10))) OVER ($frame) AS DOUBLE)
       |         / count(*) OVER ($frame)""".stripMargin
    graft.Parity.proundSql(avg, 6) + s" AS sma_$n"
  }

  private[queries] val candlesSql: String =
    """candles AS (
      |  SELECT timeframe, candle_start,
      |         arg_min(open_price, observed_at) AS open_price,
      |         max(high_price)                  AS high_price,
      |         min(low_price)                   AS low_price,
      |         arg_max(close_price, observed_at) AS close_price,
      |         count(*)                         AS ticks_5m_count
      |  FROM fanned GROUP BY 1, 2)""".stripMargin

  // ---------------------------------------------------------------- queries

  /** Silver model: typed projection + keyed dedup (P1, D2, W1). */
  val stgTicks: Q = (s, dir) =>
    ForexPipeline.silverFrom(s, dir).orderBy(col("observed_at"))

  val stgTicksSql: String =
    s"""WITH $silverSql
       |SELECT * FROM silver ORDER BY observed_at""".stripMargin

  /** Flagship: full gold model — fan-out, OHLC, indicators, md5 id
    * (T1–T6, A1–A5, W2–W4, §2.9).
    */
  val fctTimeframes: Q = (s, dir) =>
    ForexPipeline.goldFrom(s, dir).orderBy(col("timeframe"), col("candle_start"))

  val fctTimeframesSql: String =
    s"""WITH $silverSql,
       |$fannedSql,
       |$candlesSql
       |SELECT md5(timeframe || '|' || strftime(candle_start, '%Y-%m-%d %H:%M:%S')) AS unique_id,
       |       timeframe, candle_start, open_price, high_price, low_price, close_price,
       |       ticks_5m_count,
       |       close_price - lag(close_price) OVER
       |         (PARTITION BY timeframe ORDER BY candle_start) AS price_diff,
       |       ${smaSql(20)},
       |       ${smaSql(50)}
       |FROM candles
       |ORDER BY timeframe, candle_start""".stripMargin

  /** Single-timeframe OHLC aggregate (A1–A5 in isolation). */
  val ohlc1h: Q = (s, dir) => {
    val fanned = Resample.fanout(ForexPipeline.silverFrom(s, dir),
      Seq(Resample.byName("1h")))
    Ohlc.candles(fanned).orderBy(col("candle_start"))
  }

  val ohlc1hSql: String =
    s"""WITH $silverSql
       |SELECT '1h' AS timeframe,
       |       ${bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |       arg_min(open_price, observed_at) AS open_price,
       |       max(high_price)                  AS high_price,
       |       min(low_price)                   AS low_price,
       |       arg_max(close_price, observed_at) AS close_price,
       |       count(*)                         AS ticks_5m_count
       |FROM silver GROUP BY 1, 2 ORDER BY candle_start""".stripMargin

  /** EWMA over 1h candle closes — a RECURSIVE indicator
    * (ewma_t = a*x_t + (1-a)*ewma_{t-1}) that no window frame can express:
    * frames compute over values, not over prior RESULTS. Realized as a
    * prefix-list sequential fold: collect_list over a ROWS UNBOUNDED
    * PRECEDING window gives each row its ordered prefix, and `aggregate`
    * folds it left with exactly DuckDB list_reduce's association, so the
    * recurrence reproduces bit-for-bit. O(n^2) in series length per
    * series — acceptable because the input is candle-level (720 rows/month
    * at 1h), the same documented ceiling as the Indicators windows; the
    * 100 TB path for long series is a parallel prefix scan (the recurrence
    * is a linear map, hence associative in (mul, add) matrix form), noted
    * here rather than built.
    */
  /** The 1h candle relation as a SHARED fixture: eleven indicator queries
    * (the chunked family, ewma/rsi/macd/bollinger, both enrich forms)
    * consume exactly this table, and each was re-running the silver scan +
    * dedup window + candle aggregate to get it. One (JVM, dir) build, one
    * parquet write, per-consumer column-pruned scans — the derived-table
    * discipline the PCA/KLL families already follow. Timestamps (µs) and
    * doubles round-trip parquet bit-exactly, so every consumer's values
    * are unchanged.
    */
  private[queries] def candles1hShared(s: SparkSession, dir: String): DataFrame =
    graft.Scratch.fixture(s, s"candles-1h|$dir")(
      Ohlc.candles(Resample.fanout(ForexPipeline.silverFrom(s, dir),
        Seq(Resample.byName("1h")))))

  val ewma1h: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val candles = candles1hShared(s, dir)
      .select(col("candle_start"), col("close_price"))
    val w = Window.orderBy(col("candle_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    candles
      .withColumn("px", collect_list(col("close_price")).over(w))
      .select(col("candle_start"), col("close_price"),
        graft.Parity.pround(
          expr("aggregate(slice(px, 2, size(px) - 1), px[0], (acc, x) -> 0.2 * x + 0.8 * acc)"),
          6).as("ewma"))
      .orderBy(col("candle_start"))
  }

  val ewma1hSql: String =
    s"""WITH $silverSql,
       |c AS (
       |  SELECT ${bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_max(close_price, observed_at) AS close_price
       |  FROM silver GROUP BY 1),
       |pre AS (
       |  SELECT candle_start, close_price,
       |         list(close_price) OVER (ORDER BY candle_start ROWS UNBOUNDED PRECEDING) AS px
       |  FROM c)
       |SELECT candle_start, close_price,
       |       ${graft.Parity.proundSql("list_reduce(px, (acc, x) -> 0.2 * x + 0.8 * acc)", 6)} AS ewma
       |FROM pre ORDER BY candle_start""".stripMargin

  /** Fused single-buffer OHLC via the custom OhlcAgg DeclarativeAggregate —
    * same semantics and SAME ORACLE as ohlc_1h, different physical
    * aggregation (one buffer instead of four aggregate functions).
    */
  val ohlc1hFused: Q = (s, dir) => {
    val fanned = Resample.fanout(ForexPipeline.silverFrom(s, dir),
      Seq(Resample.byName("1h")))
    fanned.groupBy(col("timeframe"), col("candle_start"))
      .agg(graft.functions.OhlcAggregate.ohlc(
        col("observed_at"), col("open_price"), col("high_price"),
        col("low_price"), col("close_price")).as("c"))
      .select(col("timeframe"), col("candle_start"), col("c.open_price"),
        col("c.high_price"), col("c.low_price"), col("c.close_price"),
        col("c.ticks_5m_count"))
      .orderBy(col("candle_start"))
  }

  /** All 7 bucket expressions side-by-side (T2–T5 in isolation). */
  val resampleBuckets: Q = (s, dir) => {
    val silver = ForexPipeline.silverFrom(s, dir)
    val cols = col("observed_at") +: Resample.timeframes.map(tf =>
      Resample.bucket(col("observed_at"), tf).as(s"b_${tf.name}"))
    silver.select(cols: _*).orderBy(col("observed_at"))
  }

  val resampleBucketsSql: String = {
    val bucketCols = Resample.timeframes
      .map(tf => s"${bucketSql("observed_at", tf)} AS b_${tf.name}")
      .mkString(",\n       ")
    s"""WITH $silverSql
       |SELECT observed_at,
       |       $bucketCols
       |FROM silver ORDER BY observed_at""".stripMargin
  }

  /** Indicator stage in isolation over 1h candles (W2–W4). */
  val indicators1h: Q = (s, dir) =>
    Indicators.enrich(candles1hShared(s, dir)).orderBy(col("candle_start"))

  val indicators1hSql: String =
    s"""WITH $silverSql,
       |candles AS (
       |  SELECT '1h' AS timeframe,
       |         ${bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_min(open_price, observed_at) AS open_price,
       |         max(high_price)                  AS high_price,
       |         min(low_price)                   AS low_price,
       |         arg_max(close_price, observed_at) AS close_price,
       |         count(*)                         AS ticks_5m_count
       |  FROM silver GROUP BY 1, 2)
       |SELECT md5(timeframe || '|' || strftime(candle_start, '%Y-%m-%d %H:%M:%S')) AS unique_id,
       |       timeframe, candle_start, open_price, high_price, low_price, close_price,
       |       ticks_5m_count,
       |       close_price - lag(close_price) OVER
       |         (PARTITION BY timeframe ORDER BY candle_start) AS price_diff,
       |       ${smaSql(20)},
       |       ${smaSql(50)}
       |FROM candles ORDER BY candle_start""".stripMargin

  /** Indicator stage through the chunked scale-out path (bounded chunks +
    * ≤50-row carry-in, parallelism = #chunks instead of #timeframes) —
    * SAME ORACLE as indicators_1h: the physical strategy must not change
    * a bit.
    */
  val indicators1hChunked: Q = (s, dir) =>
    IndicatorsChunked.enrich(candles1hShared(s, dir), candlesPerChunk = 64)
      .orderBy(col("candle_start"))

  /** D1: exact whole-row dedup over raw events. */
  val dedupExactRows: Q = (s, dir) =>
    Dedup.exactRows(Tables.events(s, dir)
        .select(col("event_id"), col("ts").as("observed_at"), col("user_id"),
          col("event_type"), col("value"), col("props")))
      .orderBy(col("event_id"))

  val dedupExactRowsSql: String =
    """SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS observed_at, user_id,
      |       event_type, value, props
      |FROM events ORDER BY event_id""".stripMargin

  /** P3: high-watermark predicate — keep ticks newer than max(observed_at)−7d.
    * The watermark scalar is computed driver-side (one-row agg collect), the
    * filter then pushes down to the parquet scan (SURVEY §4 row 4).
    */
  val watermarkFilter: Q = (s, dir) => {
    val silver = ForexPipeline.silverFrom(s, dir)
    val wmRow = silver.agg(max(col("observed_at"))).first()
    val wm = wmRow.getTimestamp(0)
    val cutoff = new java.sql.Timestamp(wm.getTime - 7L * 86400000L)
    silver.filter(col("observed_at") > lit(cutoff)).orderBy(col("observed_at"))
  }

  val watermarkFilterSql: String =
    s"""WITH $silverSql
       |SELECT * FROM silver
       |WHERE observed_at > (SELECT max(observed_at) - INTERVAL 7 DAY FROM silver)
       |ORDER BY observed_at""".stripMargin

  /** T6 shape check: fan-out multiplies rows by 7, tagged per timeframe. */
  val unionFanout: Q = (s, dir) =>
    Resample.fanout(ForexPipeline.silverFrom(s, dir))
      .groupBy(col("timeframe"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("candle_start")).as("n_candles"))
      .orderBy(col("timeframe"))

  val unionFanoutSql: String =
    s"""WITH $silverSql,
       |$fannedSql
       |SELECT timeframe, count(*) AS n_rows,
       |       count(DISTINCT candle_start) AS n_candles
       |FROM fanned GROUP BY 1 ORDER BY timeframe""".stripMargin

  /** Hierarchical candle re-aggregation (Ohlc.rollupCandles): 4h/12h/24h
    * candles derived from 1h candles, never re-reading ticks. The oracle is
    * the DIRECT tick aggregation for those timeframes — rollup must be
    * indistinguishable from recompute, which is what licenses a candle
    * store to build coarse series from the finest persisted one at scale.
    */
  val candlesRollup: Q = (s, dir) => {
    val oneHour = Ohlc.candles(Resample.fanout(
      ForexPipeline.silverFrom(s, dir), Seq(Resample.byName("1h"))))
    Ohlc.rollupCandles(oneHour,
        Seq(Resample.byName("4h"), Resample.byName("12h"), Resample.byName("24h")))
      .orderBy(col("timeframe"), col("candle_start"))
  }

  val candlesRollupSql: String =
    s"""WITH $silverSql,
       |$fannedSql,
       |$candlesSql
       |SELECT timeframe, candle_start, open_price, high_price, low_price,
       |       close_price, ticks_5m_count
       |FROM candles
       |WHERE timeframe IN ('4h', '12h', '24h')
       |ORDER BY timeframe, candle_start""".stripMargin

  /** Calendar densification + forward fill: thin the 1h candle series
    * deterministically (drop hours ≡ 3 mod 5 — real feeds drop ticks, the
    * testdata doesn't), regenerate the full hourly grid with `sequence`,
    * and forward-fill close_price with `last(_, ignoreNulls)` over the
    * time order. `is_filled` marks synthesized rows. The standard
    * time-series gap-repair operator: grid generation is one row per
    * missing slot (never a cross join), the fill is one ordered window.
    * At 100 TB the window partitions by series key (symbol) exactly like
    * the indicator windows; a single global series is the documented
    * candle-level ceiling.
    */
  val gapFill: Q = (s, dir) => {
    val candles = Ohlc.candles(Resample.fanout(
        ForexPipeline.silverFrom(s, dir), Seq(Resample.byName("1h"))))
      .select(col("candle_start"), col("close_price"))
      .filter(expr("(unix_micros(candle_start) DIV 3600000000L) % 5 != 3"))
    val grid = candles
      .agg(min(col("candle_start")).as("lo"), max(col("candle_start")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("candle_start"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("candle_start"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(candles, Seq("candle_start"), "left")
      .withColumn("close_filled", last(col("close_price"), ignoreNulls = true).over(w))
      .select(col("candle_start"), col("close_filled"),
        col("close_price").isNull.cast("long").as("is_filled"))
      .orderBy(col("candle_start"))
  }

  val gapFillSql: String =
    s"""WITH $silverSql,
       |c0 AS (
       |  SELECT ${bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_max(close_price, observed_at) AS close_price
       |  FROM silver GROUP BY 1),
       |c AS (
       |  SELECT * FROM c0
       |  WHERE (epoch_us(candle_start) // 3600000000) % 5 != 3),
       |grid AS (
       |  SELECT unnest(generate_series(
       |           (SELECT min(candle_start) FROM c),
       |           (SELECT max(candle_start) FROM c),
       |           INTERVAL 1 HOUR)) AS candle_start),
       |j AS (SELECT grid.candle_start, c.close_price FROM grid LEFT JOIN c USING (candle_start))
       |SELECT candle_start,
       |       last_value(close_price IGNORE NULLS) OVER (ORDER BY candle_start
       |         ROWS UNBOUNDED PRECEDING) AS close_filled,
       |       CAST(close_price IS NULL AS BIGINT) AS is_filled
       |FROM j ORDER BY candle_start""".stripMargin

  /** Unpivot/melt: wide OHLC candles to long (candle_start, field, value)
    * form — the feature-table shape ML pipelines join on. Same single-scan
    * explode-of-structs as Resample.fanout (Spark's `stack` plans the same
    * Generate); per-row work only, no shuffle before the output sort.
    */
  val candlesUnpivot: Q = (s, dir) =>
    Ohlc.candles(Resample.fanout(
        ForexPipeline.silverFrom(s, dir), Seq(Resample.byName("1h"))))
      .select(col("candle_start"), explode(array(
        struct(lit("open").as("field"), col("open_price").as("value")),
        struct(lit("high").as("field"), col("high_price").as("value")),
        struct(lit("low").as("field"), col("low_price").as("value")),
        struct(lit("close").as("field"), col("close_price").as("value")))).as("fv"))
      .select(col("candle_start"), col("fv.field").as("field"), col("fv.value").as("value"))
      .orderBy(col("candle_start"), col("field"))

  val candlesUnpivotSql: String =
    s"""WITH $silverSql,
       |c AS (
       |  SELECT ${bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_min(open_price, observed_at) AS open_price,
       |         max(high_price) AS high_price,
       |         min(low_price) AS low_price,
       |         arg_max(close_price, observed_at) AS close_price
       |  FROM silver GROUP BY 1)
       |SELECT candle_start, 'open' AS field, open_price AS value FROM c
       |UNION ALL SELECT candle_start, 'high', high_price FROM c
       |UNION ALL SELECT candle_start, 'low', low_price FROM c
       |UNION ALL SELECT candle_start, 'close', close_price FROM c
       |ORDER BY candle_start, field""".stripMargin

  // ------------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "candles_rollup" -> candlesRollup,
    "gap_fill" -> gapFill,
    "candles_unpivot" -> candlesUnpivot,
    "stg_ticks" -> stgTicks,
    "fct_timeframes" -> fctTimeframes,
    "ohlc_1h" -> ohlc1h,
    "ewma_1h" -> ewma1h,
    "ohlc_1h_fused" -> ohlc1hFused,
    "resample_buckets" -> resampleBuckets,
    "indicators_1h" -> indicators1h,
    "indicators_1h_chunked" -> indicators1hChunked,
    "dedup_exact_rows" -> dedupExactRows,
    "watermark_filter" -> watermarkFilter,
    "union_fanout" -> unionFanout)

  val oracleSql: Map[String, String] = Map(
    "candles_rollup" -> candlesRollupSql, // rollup-from-1h vs direct-from-ticks
    "gap_fill" -> gapFillSql,
    "candles_unpivot" -> candlesUnpivotSql,
    "stg_ticks" -> stgTicksSql,
    "fct_timeframes" -> fctTimeframesSql,
    "ohlc_1h" -> ohlc1hSql,
    "ewma_1h" -> ewma1hSql,
    "ohlc_1h_fused" -> ohlc1hSql, // same semantics, custom aggregate physical op
    "resample_buckets" -> resampleBucketsSql,
    "indicators_1h" -> indicators1hSql,
    "indicators_1h_chunked" -> indicators1hSql, // same semantics, chunked plan
    "dedup_exact_rows" -> dedupExactRowsSql,
    "watermark_filter" -> watermarkFilterSql,
    "union_fanout" -> unionFanoutSql)
}
