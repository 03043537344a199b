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

  /** Per-symbol 1h close-price candles shared by the recursive-indicator
    * queries below (Spark side).
    */
  private def candles1hMulti(s: SparkSession, dir: String) =
    graft.forex.Ohlc.candles(
        Resample.fanout(ForexPipeline.silverMultiFrom(s, dir),
          Seq(Resample.byName("1h")), Seq("symbol")), Seq("symbol"))
      .select(col("symbol"), col("candle_start"), col("close_price"))

  /** Matching DuckDB CTE `c` (same shape as IndicatorQueries.candles1hSql
    * with symbol threaded through) — the ONE definition every multisym
    * indicator oracle composes, so a fix to the bucket or tie-break
    * reaches all of them.
    */
  private val candles1hMultiSql: String =
    s"""c AS (
       |  SELECT symbol,
       |         ${ForexQueries.bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |         arg_max(close_price, observed_at) AS close_price
       |  FROM silver GROUP BY 1, 2)""".stripMargin

  /** Recursive EWMA per symbol — the prefix-fold recurrence of ewma_1h with
    * the fold window partitioned by symbol: recursion parallelizes across
    * symbols with no reassociation (each symbol's fold is the sequential
    * association, so the oracle is the same fold per partition).
    */
  val ewmaMultisym: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("symbol")).orderBy(col("candle_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    candles1hMulti(s, dir)
      .withColumn("px", collect_list(col("close_price")).over(w))
      .select(col("symbol"), col("candle_start"), col("close_price"),
        graft.Parity.pround(
          expr("aggregate(slice(px, 2, size(px) - 1), px[0], (acc, x) -> 0.2 * x + 0.8 * acc)"),
          6).as("ewma"))
      .orderBy(col("symbol"), col("candle_start"))
  }

  val ewmaMultisymSql: String =
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |pre AS (
       |  SELECT symbol, candle_start, close_price,
       |         list(close_price) OVER (PARTITION BY symbol ORDER BY candle_start
       |           ROWS UNBOUNDED PRECEDING) AS px
       |  FROM c)
       |SELECT symbol, candle_start, close_price,
       |       ${graft.Parity.proundSql("list_reduce(px, (acc, x) -> 0.2 * x + 0.8 * acc)", 6)} AS ewma
       |FROM pre ORDER BY symbol, candle_start""".stripMargin

  /** RSI per symbol: the Wilder recursion's lag and prefix folds all
    * partition by symbol — recursive indicators parallelize across the
    * instrument universe with no reassociation (each symbol's fold is the
    * sequential association).
    */
  val rsiMultisym: Q = (s, dir) =>
    graft.forex.TechIndicators.rsi(candles1hMulti(s, dir), keyCols = Seq("symbol"))
      .orderBy(col("symbol"), col("candle_start"))

  val rsiMultisymSql: String =
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |d AS (
       |  SELECT symbol, candle_start, close_price,
       |         close_price - lag(close_price) OVER
       |           (PARTITION BY symbol ORDER BY candle_start) AS diff
       |  FROM c),
       |g AS (
       |  SELECT symbol, candle_start, close_price,
       |         greatest(diff, 0.0) AS gain, greatest(0.0 - diff, 0.0) AS loss
       |  FROM d WHERE diff IS NOT NULL),
       |p AS (
       |  SELECT symbol, candle_start, close_price,
       |         list(gain) OVER pw AS gl, list(loss) OVER pw AS ll
       |  FROM g WINDOW pw AS (PARTITION BY symbol ORDER BY candle_start
       |    ROWS UNBOUNDED PRECEDING)),
       |a AS (
       |  SELECT symbol, candle_start, close_price,
       |         list_reduce(gl, (acc, x) -> (acc * 13.0 + x) / 14.0) AS avg_gain,
       |         list_reduce(ll, (acc, x) -> (acc * 13.0 + x) / 14.0) AS avg_loss
       |  FROM p)
       |SELECT symbol, candle_start, close_price,
       |       ${graft.Parity.proundSql(
               "CASE WHEN avg_loss = 0.0 THEN 100.0 " +
               "ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END", 6)} AS rsi_14
       |FROM a ORDER BY symbol, candle_start""".stripMargin

  /** Bollinger bands per symbol: frame window partitioned by symbol. */
  val bollingerMultisym: Q = (s, dir) =>
    graft.forex.TechIndicators.bollinger(candles1hMulti(s, dir), keyCols = Seq("symbol"))
      .orderBy(col("symbol"), col("candle_start"))

  val bollingerMultisymSql: String =
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |p AS (
       |  SELECT symbol, candle_start, close_price,
       |         list(close_price) OVER (PARTITION BY symbol ORDER BY candle_start
       |           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS px
       |  FROM c),
       |m AS (
       |  SELECT symbol, candle_start, close_price, px,
       |         list_reduce(px, (acc, x) -> acc + x) / CAST(len(px) AS DOUBLE) AS bb_mid
       |  FROM p),
       |sd AS (
       |  SELECT symbol, candle_start, close_price, bb_mid,
       |         sqrt(list_reduce(list_transform(px, x -> (x - bb_mid) * (x - bb_mid)),
       |                          (acc, x) -> acc + x) / CAST(len(px) AS DOUBLE)) AS bb_sd
       |  FROM m)
       |SELECT symbol, candle_start, close_price,
       |       ${graft.Parity.proundSql("bb_mid", 6)} AS bb_mid,
       |       ${graft.Parity.proundSql("bb_mid + 2.0 * bb_sd", 6)} AS bb_upper,
       |       ${graft.Parity.proundSql("bb_mid - 2.0 * bb_sd", 6)} AS bb_lower
       |FROM sd ORDER BY symbol, candle_start""".stripMargin

  /** MACD per symbol: both EMA folds and the signal fold partition by
    * symbol.
    */
  val macdMultisym: Q = (s, dir) =>
    graft.forex.TechIndicators.macd(candles1hMulti(s, dir), keyCols = Seq("symbol"))
      .orderBy(col("symbol"), col("candle_start"))

  val macdMultisymSql: String =
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |p AS (
       |  SELECT symbol, candle_start, close_price,
       |         list(close_price) OVER (PARTITION BY symbol ORDER BY candle_start
       |           ROWS UNBOUNDED PRECEDING) AS px
       |  FROM c),
       |m AS (
       |  SELECT symbol, candle_start, close_price,
       |         list_reduce(px, (acc, x) -> acc + (2.0 / 13.0) * (x - acc))
       |         - list_reduce(px, (acc, x) -> acc + (2.0 / 27.0) * (x - acc)) AS macd
       |  FROM p),
       |ms AS (
       |  SELECT symbol, candle_start, close_price, macd,
       |         list(macd) OVER (PARTITION BY symbol ORDER BY candle_start
       |           ROWS UNBOUNDED PRECEDING) AS ml
       |  FROM m),
       |sg AS (
       |  SELECT symbol, candle_start, close_price, macd,
       |         list_reduce(ml, (acc, x) -> acc + (2.0 / 10.0) * (x - acc)) AS signal
       |  FROM ms)
       |SELECT symbol, candle_start, close_price,
       |       ${graft.Parity.proundSql("macd", 6)} AS macd,
       |       ${graft.Parity.proundSql("signal", 6)} AS macd_signal,
       |       ${graft.Parity.proundSql("macd - signal", 6)} AS macd_hist
       |FROM sg ORDER BY symbol, candle_start""".stripMargin

  /** Per-symbol gap repair: each symbol gets its own dense hourly grid
    * (span = that symbol's [min, max]) and its own forward fill — grid
    * generation is one `sequence` row per symbol (never a cross join) and
    * the fill window partitions by symbol, the exact shape gap_fill's
    * scaladoc promises at 100 TB.
    */
  val gapFillMultisym: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val candles = candles1hMulti(s, dir)
      .filter(expr("(unix_micros(candle_start) DIV 3600000000L) % 5 != 3"))
    val grid = candles
      .groupBy(col("symbol"))
      .agg(min(col("candle_start")).as("lo"), max(col("candle_start")).as("hi"))
      .select(col("symbol"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("candle_start"))
    val w = Window.partitionBy(col("symbol")).orderBy(col("candle_start"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(candles, Seq("symbol", "candle_start"), "left")
      .withColumn("close_filled", last(col("close_price"), ignoreNulls = true).over(w))
      .select(col("symbol"), col("candle_start"), col("close_filled"),
        col("close_price").isNull.cast("long").as("is_filled"))
      .orderBy(col("symbol"), col("candle_start"))
  }

  val gapFillMultisymSql: String =
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |cf AS (
       |  SELECT * FROM c
       |  WHERE (epoch_us(candle_start) // 3600000000) % 5 != 3),
       |spans AS (
       |  SELECT symbol, min(candle_start) AS lo, max(candle_start) AS hi
       |  FROM cf GROUP BY 1),
       |grid AS (
       |  SELECT symbol, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS candle_start
       |  FROM spans),
       |j AS (
       |  SELECT grid.symbol, grid.candle_start, cf.close_price
       |  FROM grid LEFT JOIN cf USING (symbol, candle_start))
       |SELECT symbol, candle_start,
       |       last_value(close_price IGNORE NULLS) OVER (PARTITION BY symbol
       |         ORDER BY candle_start ROWS UNBOUNDED PRECEDING) AS close_filled,
       |       CAST(close_price IS NULL AS BIGINT) AS is_filled
       |FROM j ORDER BY symbol, candle_start""".stripMargin

  /** Chunk-parallel EWMA per symbol — chunking COMPOSED with the series
    * key, the whale-symbol case: one instrument's series too long for a
    * single sorted task splits into time chunks WITHIN its symbol
    * partition, so parallelism is |symbols| × |chunks| and no task ever
    * sees a whole series. Same reassociated affine-scan arithmetic as
    * ewma_chunked, so it carries its own chunked-association oracle with
    * every window partitioned by symbol and a per-symbol seed.
    */
  /** Max distinct 64-candle chunk count over symbols, once per (JVM, dir):
    * the guard + scan hint of IndicatorQueries.chunksChecked, keyed per
    * symbol (ADVICE r13 #4 — the chunked oracle mirrors the flat base
    * case, exact only at ≤64 chunks per series).
    */
  private val chunkCountsMulti =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def chunksCheckedMulti(s: SparkSession, dir: String): Long = {
    val n: Long = chunkCountsMulti.computeIfAbsent(dir, _ => {
      val r = candles1hMulti(s, dir)
        .select(col("symbol"),
          expr(s"unix_micros(candle_start) DIV ${3600000000L * 64}L").as("ck"))
        .distinct().groupBy(col("symbol")).count()
        .agg(max(col("count"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    })
    if (n > 64)
      throw new IllegalStateException(
        s"ewma_chunked_multisym oracle depth exceeded: $n chunks > fanout " +
          "64 for some symbol — the oracle mirrors MonoidScan's flat base " +
          "case; longer histories take the documented fanout-64 " +
          "hierarchical association (one more CTE level per 64x)")
    n
  }

  val ewmaChunkedMultisym: Q = (s, dir) =>
    graft.forex.TechIndicators.ewmaChunked(
        candles1hMulti(s, dir), keyCols = Seq("symbol"),
        maxChunksHint = Some(chunksCheckedMulti(s, dir)))
      .orderBy(col("symbol"), col("candle_start"))

  val ewmaChunkedMultisymSql: String = {
    val w = 3600000000L * 64
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |ck AS (
       |  SELECT symbol, candle_start, close_price,
       |         epoch_us(candle_start) // $w AS chunk_id
       |  FROM c),
       |p AS (
       |  SELECT *, list(close_price) OVER (PARTITION BY symbol, chunk_id
       |    ORDER BY candle_start ROWS UNBOUNDED PRECEDING) AS px
       |  FROM ck),
       |ab AS (
       |  SELECT symbol, candle_start, close_price, chunk_id,
       |         list_reduce(
       |           list_transform(px, x -> {'a': CAST(0.8 AS DOUBLE), 'b': 0.2 * x}),
       |           (acc, f) -> {'a': f.a * acc.a, 'b': f.a * acc.b + f.b}) AS abf
       |  FROM p),
       |lastc AS (
       |  SELECT symbol, chunk_id, arg_max(abf, candle_start) AS tot
       |  FROM ab GROUP BY 1, 2),
       |firsts AS (
       |  SELECT symbol, arg_min(close_price, candle_start) AS first_close
       |  FROM c GROUP BY 1),
       |pv AS (
       |  SELECT symbol, chunk_id,
       |         coalesce(list(tot) OVER (PARTITION BY symbol ORDER BY chunk_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), []) AS prev
       |  FROM lastc),
       |si AS (
       |  SELECT pv.symbol, pv.chunk_id,
       |         list_reduce(
       |           list_prepend({'a': CAST(1.0 AS DOUBLE), 'b': fc.first_close}, prev),
       |           (acc, f) -> {'a': CAST(1.0 AS DOUBLE), 'b': f.a * acc.b + f.b}).b AS s_in
       |  FROM pv JOIN firsts fc USING (symbol))
       |SELECT ab.symbol, ab.candle_start, ab.close_price,
       |       ${graft.Parity.proundSql("ab.abf.a * si.s_in + ab.abf.b", 6)} AS ewma
       |FROM ab JOIN si ON ab.symbol = si.symbol AND ab.chunk_id = si.chunk_id
       |ORDER BY ab.symbol, ab.candle_start""".stripMargin
  }

  /** STREAMING multi-symbol candles at the gate: the silver multi-symbol
    * ticks flow as a file stream through the (symbol, window) grouped OHLC —
    * streaming state and shuffle key on the instrument universe, the same
    * parallelism story as the batch multisym pipeline — and the bounded
    * complete-mode run must equal the batch per-symbol candle query
    * bit-for-bit.
    */
  val streamOhlcMultisym: Q = (s, dir) => {
    val base = PipelineQueries.ensureFixture(s, "stream_ohlc_multisym", dir) { b =>
      ForexPipeline.silverMultiFrom(s, dir)
        .coalesce(8) // bounded source file count for the stream listing
        .write.mode("overwrite").parquet(b)
    }
    PipelineQueries.runBoundedStream(s, "graft_stream_ohlc_multisym",
      () => graft.streaming.ForexStream
        .candlesComplete(graft.streaming.ForexStream.ticksMulti(s, base),
          Resample.byName("1h"), keyCols = Seq("symbol")),
      "complete").orderBy(col("symbol"), col("candle_start"))
  }

  val streamOhlcMultisymSql: String =
    s"""WITH $silverMultiSql
       |SELECT symbol, '1h' AS timeframe,
       |       ${ForexQueries.bucketSql("observed_at", Resample.byName("1h"))} AS candle_start,
       |       arg_min(open_price, observed_at)  AS open_price,
       |       max(high_price)                   AS high_price,
       |       min(low_price)                    AS low_price,
       |       arg_max(close_price, observed_at) AS close_price,
       |       count(*)                          AS ticks_5m_count
       |FROM silver GROUP BY 1, 2, 3
       |ORDER BY symbol, candle_start""".stripMargin

  /** STREAMING stateful EWMA: the per-symbol recurrence maintained as
    * custom flatMapGroupsWithState state (O(1) per symbol — last ts +
    * current ewma), the operator shape for recursive indicators over
    * unbounded streams where no window frame can express the update. The
    * bounded AvailableNow run must emit the batch prefix fold bit-for-bit,
    * so it shares `ewma_multisym`'s oracle.
    */
  val streamEwma: Q = (s, dir) => {
    val base = PipelineQueries.ensureFixture(s, "stream_ewma", dir) { b =>
      candles1hMulti(s, dir)
        .coalesce(4) // bounded source file count for the stream listing
        .write.mode("overwrite").parquet(b)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("symbol",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("candle_start",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("close_price",
        org.apache.spark.sql.types.DoubleType)))
    // append-mode result read back from persisted files through the
    // production sink (the stream_dedup routing; VERDICT r13 missing #1's
    // principle — this was the last append-mode memory read-back)
    PipelineQueries.runBoundedStreamToSink(s, "graft_stream_ewma",
      () => {
        import s.implicits._
        graft.streaming.StatefulEwma.ewma(
          s.readStream.schema(schema).parquet(base)
            .as[graft.streaming.StatefulEwma.Candle],
          alpha = 0.2, beta = 0.8).toDF()
      })
      .select(col("symbol"), col("candle_start"), col("close_price"),
        graft.Parity.pround(col("ewma"), 6).as("ewma"))
      .orderBy(col("symbol"), col("candle_start"))
  }

  // ------------------------------------------------------------- registry

  /** Pairwise Pearson correlation of hourly closes across the symbol
    * universe — the cross-instrument analytics a risk/signal pipeline
    * runs. Neither engine's built-in `corr` is reproducible (both fold a
    * streaming covariance in arrival order), so the moments are
    * accumulated as exact DECIMAL sums (association-independent) and the
    * closed form r = (n·Σxy − ΣxΣy) / (√(n·Σx² − (Σx)²)·√(n·Σy² − (Σy)²))
    * is evaluated in doubles FROM those identical sums — every op IEEE
    * and deterministic, so the two engines agree bit-for-bit before the
    * final pround.
    *
    * Shape: the hourly candle relation self-joins ON THE HOUR KEY
    * (co-partitioned, one shuffle), emitting |symbols|²/2 rows per hour;
    * the pair aggregate map-side-combines into a symbol-pair-bounded
    * group set. At 100 TB the shuffle carries candle rows, never ticks.
    */
  val priceCorrelation: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    def sx(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(30, 10))).cast("double")
    val c = candles1hMulti(s, dir)
    val a = c.select(col("symbol").as("symbol_a"), col("candle_start"),
      col("close_price").as("x"))
    val b = c.select(col("symbol").as("symbol_b"), col("candle_start"),
      col("close_price").as("y"))
    val nD = col("n_hours").cast("double")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val varX = nD * col("sxx") - col("sx") * col("sx")
    val varY = nD * col("syy") - col("sy") * col("sy")
    a.join(b, Seq("candle_start"))
      .filter(col("symbol_a") < col("symbol_b"))
      .groupBy(col("symbol_a"), col("symbol_b"))
      .agg(count(lit(1)).as("n_hours"),
        sx(col("x")).as("sx"), sx(col("y")).as("sy"),
        sx(col("x") * col("y")).as("sxy"),
        sx(col("x") * col("x")).as("sxx"),
        sx(col("y") * col("y")).as("syy"))
      .select(col("symbol_a"), col("symbol_b"), col("n_hours"),
        when(varX > 0 && varY > 0,
          graft.Parity.pround(cov / (sqrt(varX) * sqrt(varY)), 6))
          .otherwise(lit(0.0)).as("corr"))
      .orderBy(col("symbol_a"), col("symbol_b"))
  }

  val priceCorrelationSql: String = {
    def sx(e: String) = s"CAST(sum(CAST(($e) AS DECIMAL(30,10))) AS DOUBLE)"
    s"""WITH $silverMultiSql,
       |$candles1hMultiSql,
       |j AS (
       |  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
       |         a.close_price AS x, b.close_price AS y
       |  FROM c a JOIN c b
       |    ON a.candle_start = b.candle_start AND a.symbol < b.symbol),
       |g AS (
       |  SELECT symbol_a, symbol_b, CAST(count(*) AS BIGINT) AS n_hours,
       |         ${sx("x")} AS sx, ${sx("y")} AS sy,
       |         ${sx("x * y")} AS sxy, ${sx("x * x")} AS sxx, ${sx("y * y")} AS syy
       |  FROM j GROUP BY 1, 2)
       |SELECT symbol_a, symbol_b, n_hours,
       |       CASE WHEN CAST(n_hours AS DOUBLE) * sxx - sx * sx > 0
       |             AND CAST(n_hours AS DOUBLE) * syy - sy * sy > 0
       |            THEN ${graft.Parity.proundSql(
                  "(CAST(n_hours AS DOUBLE) * sxy - sx * sy) / " +
                    "(sqrt(CAST(n_hours AS DOUBLE) * sxx - sx * sx) * " +
                    "sqrt(CAST(n_hours AS DOUBLE) * syy - sy * sy))", 6)}
       |            ELSE 0.0 END AS corr
       |FROM g ORDER BY symbol_a, symbol_b""".stripMargin
  }

  /** Per-symbol OLS price trend — the closed-form simple regression of
    * price on time, computed entirely as SUFFICIENT STATISTICS (n, Σx,
    * Σy, Σxy, Σx²) in one map-side-combined aggregate: regression as an
    * aggregation, never an iterative solver. x is seconds since the
    * SYMBOL's first tick — centering x per symbol keeps Σx² within
    * DECIMAL(38,0) at any corpus age (raw epoch-µs squared overflows even
    * 38 digits once row counts grow), and the per-symbol minimum is an
    * instrument-universe-bounded relation broadcast back. slope/intercept
    * are derived in doubles from the exact-DECIMAL sums with one fixed
    * operation order on both engines.
    */
  val olsTrend: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val ev = graft.Tables.events(s, dir)
      .select(col("event_type").as("symbol"),
        unix_micros(col("ts")).as("us"), col("value").as("y"))
    val mins = ev.groupBy(col("symbol")).agg(min(col("us")).as("mn"))
    val xy = ev.join(broadcast(mins), "symbol")
      .withColumn("x", expr("(us - mn) DIV 1000000"))
    val g = xy.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).cast("double").as("sx"),
        sum(col("y").cast(DecimalType(30, 10))).cast("double").as("sy"),
        sum((col("x").cast("double") * col("y"))
          .cast(DecimalType(38, 10))).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0)))
          .cast("double").as("sxx"))
      .withColumn("nd", col("n").cast("double"))
      .filter(col("nd") * col("sxx") - col("sx") * col("sx") > lit(0.0))
      .withColumn("slope", (col("nd") * col("sxy") - col("sx") * col("sy")) /
        (col("nd") * col("sxx") - col("sx") * col("sx")))
    g.select(col("symbol"), col("n"),
        graft.Parity.pround(col("slope") * lit(1e9), 6).as("slope_per_gs"),
        graft.Parity.pround(
          (col("sy") - col("slope") * col("sx")) / col("nd"), 6)
          .as("intercept"))
      .orderBy(col("symbol"))
  }

  val olsTrendSql: String =
    s"""WITH ev AS (
       |  SELECT event_type AS symbol, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value AS y
       |  FROM events),
       |mins AS (SELECT symbol, min(us) AS mn FROM ev GROUP BY 1),
       |xy AS (SELECT ev.symbol, (us - mn) // 1000000 AS x, y
       |       FROM ev JOIN mins USING (symbol)),
       |g AS (
       |  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
       |         CAST(sum(CAST(y AS DECIMAL(30,10))) AS DOUBLE) AS sy,
       |         CAST(sum(CAST(CAST(x AS DOUBLE) * y AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
       |         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
       |  FROM xy GROUP BY 1),
       |d AS (
       |  SELECT symbol, n, sx, sy, sxy, sxx, CAST(n AS DOUBLE) AS nd,
       |         (CAST(n AS DOUBLE) * sxy - sx * sy)
       |           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
       |  FROM g WHERE CAST(n AS DOUBLE) * sxx - sx * sx > 0.0)
       |SELECT symbol, n,
       |       ${graft.Parity.proundSql("slope * 1e9", 6)} AS slope_per_gs,
       |       ${graft.Parity.proundSql("(sy - slope * sx) / nd", 6)} AS intercept
       |FROM d ORDER BY symbol""".stripMargin

  /** Per-symbol maximum drawdown — the peak-to-trough risk metric:
    * min over time of price/runningPeak − 1 under the deterministic
    * (ts, event_id) tick order. The running peak is computed WITHOUT a
    * whale window: max is associative, so the series splits into
    * time-contiguous day chunks — per-chunk peaks (one aggregate), a
    * prefix peak over the chunk RELATION (a window over #days rows per
    * symbol, bounded by span, the [[graft.forex.IndicatorsChunked]]
    * assembly shape), then a within-chunk running max over day-bounded
    * partitions. greatest(carry, within) is the exact running peak; the
    * final min per symbol is a plain aggregate. No task ever sorts more
    * than one symbol-day.
    *
    * Parity: runmax is a max of raw doubles (exact, order-free given the
    * pinned total order), dd is ONE division + subtraction per row, and
    * min(dd) involves no summation — bit-equal by construction.
    */
  val maxDrawdown: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val dayUs = 86400000000L
    val ev = graft.Tables.events(s, dir)
      .select(col("event_type").as("symbol"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("chunk", expr(s"us DIV ${dayUs}L"))
    val chunkPeaks = ev.groupBy(col("symbol"), col("chunk"))
      .agg(max(col("value")).as("cmax"))
    val carry = chunkPeaks.withColumn("carry",
      max(col("cmax")).over(Window.partitionBy(col("symbol"))
        .orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("symbol"), col("chunk"), col("carry"))
    val within = Window.partitionBy(col("symbol"), col("chunk"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.join(carry, Seq("symbol", "chunk"))
      .withColumn("runmax",
        greatest(coalesce(col("carry"), col("value")),
          max(col("value")).over(within)))
      .withColumn("dd", col("value") / col("runmax") - lit(1.0))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        graft.Parity.pround(min(col("dd")), 6).as("max_drawdown"))
      .orderBy(col("symbol"))
  }

  val maxDrawdownSql: String =
    s"""WITH ev AS (
       |  SELECT event_type AS symbol, event_id,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
       |  FROM events),
       |r AS (
       |  SELECT symbol, value,
       |         max(value) OVER (PARTITION BY symbol ORDER BY us, event_id
       |                          ROWS UNBOUNDED PRECEDING) AS runmax
       |  FROM ev)
       |SELECT symbol, CAST(count(*) AS BIGINT) AS n_ticks,
       |       ${graft.Parity.proundSql("min(value / runmax - 1.0)", 6)} AS max_drawdown
       |FROM r GROUP BY symbol ORDER BY symbol""".stripMargin

  /** Autocorrelation of the hourly price series at lags 1–3 per symbol —
    * the stationarity probe run before fitting any time-series model (an
    * ACF near 1 at lag 1 = strong persistence; near 0 = the series is
    * already noise). The series is the per-(symbol, hour) mean price —
    * QUANTIZED (pround 6) at construction so both engines correlate
    * bit-identical series — and each lag's Pearson r reduces to
    * sufficient statistics over (x_t, x_{t+L}) pairs from a lead window
    * partitioned by symbol over the HOURLY relation (bounded by time
    * span per symbol — the candle-window precedent, never raw ticks).
    */
  val acfHourly: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    def sd(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(30, 10)))
    val hourly = graft.Scratch.table(
      graft.Tables.events(s, dir)
        .select(col("event_type").as("symbol"),
          expr("unix_micros(ts) DIV 3600000000").as("hr"), col("value"))
        .groupBy(col("symbol"), col("hr"))
        .agg(graft.Parity.pround(
          sd(col("value")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("x")),
      "acf-hourly")
    val w = Window.partitionBy(col("symbol")).orderBy(col("hr"))
    // ONE window pass computes all three leads (three would re-sort the
    // partition per lag); the per-lag rows unpivot from it
    val lagged = hourly
      .select(col("symbol"), col("x"),
        lead(col("x"), 1).over(w).as("y1"),
        lead(col("x"), 2).over(w).as("y2"),
        lead(col("x"), 3).over(w).as("y3"))
      .select(col("symbol"), col("x"), explode(array(
        struct(lit(1L).as("lag"), col("y1").as("y")),
        struct(lit(2L).as("lag"), col("y2").as("y")),
        struct(lit(3L).as("lag"), col("y3").as("y")))).as("ly"))
      .select(col("symbol"), col("ly.lag").as("lag"), col("x"), col("ly.y").as("y"))
      .filter(col("y").isNotNull)
    lagged.groupBy(col("symbol"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sd(col("x")).cast("double").as("sx"),
        sd(col("y")).cast("double").as("sy"),
        sd(col("x") * col("y")).cast("double").as("sxy"),
        sd(col("x") * col("x")).cast("double").as("sxx"),
        sd(col("y") * col("y")).cast("double").as("syy"))
      .withColumn("nd", col("n_pairs").cast("double"))
      .filter(col("nd") * col("sxx") - col("sx") * col("sx") > lit(0.0) &&
        col("nd") * col("syy") - col("sy") * col("sy") > lit(0.0))
      .select(col("symbol"), col("lag"), col("n_pairs"),
        graft.Parity.pround(
          (col("nd") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("nd") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("nd") * col("syy") - col("sy") * col("sy"))), 6)
          .as("acf"))
      .orderBy(col("symbol"), col("lag"))
  }

  val acfHourlySql: String = {
    def sx(e: String) = s"CAST(sum(CAST($e AS DECIMAL(30,10))) AS DOUBLE)"
    s"""WITH hourly AS (
       |  SELECT event_type AS symbol,
       |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
       |         ${graft.Parity.proundSql(
                   "CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / CAST(count(*) AS DOUBLE)",
                   6)} AS x
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  ${(1 to 3).map(l =>
            s"""SELECT symbol, CAST($l AS BIGINT) AS lag, x,
               |         lead(x, $l) OVER (PARTITION BY symbol ORDER BY hr) AS y
               |  FROM hourly""".stripMargin).mkString("\n  UNION ALL\n  ")}),
       |p AS (SELECT * FROM lagged WHERE y IS NOT NULL),
       |g AS (
       |  SELECT symbol, lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(count(*) AS DOUBLE) AS nd,
       |         ${sx("x")} AS sx, ${sx("y")} AS sy, ${sx("x * y")} AS sxy,
       |         ${sx("x * x")} AS sxx, ${sx("y * y")} AS syy
       |  FROM p GROUP BY 1, 2)
       |SELECT symbol, lag, n_pairs,
       |       ${graft.Parity.proundSql(
                 "(nd * sxy - sx * sy) / (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))",
                 6)} AS acf
       |FROM g
       |WHERE nd * sxx - sx * sx > 0.0 AND nd * syy - sy * sy > 0.0
       |ORDER BY symbol, lag""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "acf_hourly" -> acfHourly,
    "ols_trend" -> olsTrend,
    "max_drawdown" -> maxDrawdown,
    "price_correlation" -> priceCorrelation,
    "stream_ewma" -> streamEwma,
    "fct_timeframes_multisym" -> fctTimeframesMultisym,
    "indicators_multisym" -> indicatorsMultisym,
    "ewma_multisym" -> ewmaMultisym,
    "rsi_multisym" -> rsiMultisym,
    "bollinger_multisym" -> bollingerMultisym,
    "macd_multisym" -> macdMultisym,
    "gap_fill_multisym" -> gapFillMultisym,
    "ewma_chunked_multisym" -> ewmaChunkedMultisym,
    "stream_ohlc_multisym" -> streamOhlcMultisym)

  val oracleSql: Map[String, String] = Map(
    "acf_hourly" -> acfHourlySql,
    "ols_trend" -> olsTrendSql,
    "max_drawdown" -> maxDrawdownSql,
    "price_correlation" -> priceCorrelationSql,
    "fct_timeframes_multisym" -> fctTimeframesMultisymSql,
    "indicators_multisym" -> indicatorsMultisymSql,
    "ewma_multisym" -> ewmaMultisymSql,
    "stream_ewma" -> ewmaMultisymSql, // stateful stream == batch prefix fold
    "rsi_multisym" -> rsiMultisymSql,
    "bollinger_multisym" -> bollingerMultisymSql,
    "macd_multisym" -> macdMultisymSql,
    "gap_fill_multisym" -> gapFillMultisymSql,
    "ewma_chunked_multisym" -> ewmaChunkedMultisymSql,
    "stream_ohlc_multisym" -> streamOhlcMultisymSql)
}
