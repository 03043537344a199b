package graft.forex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced technical indicators over candle series — the indicator families
  * the reference's gold model (fct_eurusd_timeframes.sql:73-83) stops short
  * of (it ships price_diff + 2 SMAs; real chart pipelines add bands,
  * momentum, and EMA crossovers on the same candle stream).
  *
  * Cross-engine determinism is the design driver, exactly as in
  * [[Indicators]] and the ewma_1h query:
  *
  *  - Window-frame float sums are association-dependent between engines, so
  *    every frame statistic here is a SEQUENTIAL LEFT FOLD over the frame's
  *    ordered prefix list (`collect_list` over a ROWS frame → `aggregate`
  *    with `slice`/`[0]` seed), which is exactly DuckDB's
  *    `list_reduce(list(...) OVER frame, λ)` association — both engines
  *    produce bit-identical doubles, then round via Parity.pround.
  *  - Recursive indicators (EMA, Wilder smoothing) cannot be expressed by
  *    any window frame (frames see values, not prior results); the prefix
  *    fold IS the recurrence.
  *
  * Cost: O(frame²) per row for bounded frames (Bollinger: 20² per candle),
  * O(n²) per series for the unbounded recursions (RSI/MACD) — acceptable
  * because input is candle-level (720 rows/month at 1h), the same documented
  * ceiling as Indicators' windows. The 100 TB path for long series is a
  * parallel prefix scan (EMA is a linear recurrence, associative in
  * (mul, add) matrix form); candle counts do not reach it.
  */
object TechIndicators {

  private val w = Window.orderBy(col("candle_start"))
  private val prefix = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Sequential left fold over an array COLUMN (referenced by name) matching
    * DuckDB `list_reduce`: seed = first element, fold elements 2..n. The
    * lambda must be written with the same literal arithmetic as the oracle's.
    */
  private def foldCol(name: String, lambda: String): Column =
    expr(s"aggregate(slice($name, 2, size($name) - 1), $name[0], $lambda)")

  // ------------------------------------------------------------- Bollinger

  /** Bollinger bands over an n-candle ROWS frame: mid = frame mean, bands =
    * mid ± k·σ (population σ). Mean and σ are two sequential folds over the
    * same frame list, so both are bit-deterministic cross-engine. Partial
    * frames at the series start use the available rows (mirrors
    * Indicators.sma's partial-frame semantics).
    */
  def bollinger(candles: DataFrame, n: Int = 20, k: Double = 2.0): DataFrame =
    candles
      .withColumn("px", collect_list(col("close_price"))
        .over(w.rowsBetween(-(n - 1), Window.currentRow)))
      .withColumn("bb_mid",
        foldCol("px", "(acc, x) -> acc + x") / size(col("px")).cast("double"))
      .withColumn("sq", expr("transform(px, x -> (x - bb_mid) * (x - bb_mid))"))
      .withColumn("bb_sd",
        sqrt(foldCol("sq", "(acc, x) -> acc + x") / size(col("px")).cast("double")))
      .select(col("candle_start"), col("close_price"),
        graft.Parity.pround(col("bb_mid"), 6).as("bb_mid"),
        graft.Parity.pround(col("bb_mid") + lit(k) * col("bb_sd"), 6).as("bb_upper"),
        graft.Parity.pround(col("bb_mid") - lit(k) * col("bb_sd"), 6).as("bb_lower"))

  // ------------------------------------------------------------------ RSI

  /** Relative Strength Index with Wilder smoothing, seeded at the first
    * gain/loss (documented seeding choice; the classic SMA-of-first-n seed
    * converges to the same recurrence after n steps). Rows before the first
    * price change have no diff and are excluded (RSI is undefined there).
    *
    * avg_t = (avg_{t-1} · (n−1) + x_t) / n — the fold lambda is written with
    * the identical literal arithmetic in the DuckDB oracle.
    */
  def rsi(candles: DataFrame, n: Int = 14): DataFrame = {
    val lam = s"(acc, x) -> (acc * ${n - 1}.0 + x) / $n.0"
    candles
      .withColumn("diff", col("close_price") - lag(col("close_price"), 1).over(w))
      .filter(col("diff").isNotNull)
      // 0.0 - diff, not unary minus: greatest(-0.0, 0.0) is engine-dependent
      // in which zero it returns; 0.0 - (+0.0) is +0.0 everywhere
      .withColumn("gain", greatest(col("diff"), lit(0.0)))
      .withColumn("loss", greatest(lit(0.0) - col("diff"), lit(0.0)))
      .withColumn("gl", collect_list(col("gain")).over(prefix))
      .withColumn("ll", collect_list(col("loss")).over(prefix))
      .withColumn("avg_gain", foldCol("gl", lam))
      .withColumn("avg_loss", foldCol("ll", lam))
      .select(col("candle_start"), col("close_price"),
        graft.Parity.pround(
          when(col("avg_loss") === lit(0.0), lit(100.0))
            .otherwise(lit(100.0) -
              lit(100.0) / (lit(1.0) + col("avg_gain") / col("avg_loss"))),
          6).as(s"rsi_$n"))
  }

  // ----------------------------------------------------------------- MACD

  /** MACD(12, 26, 9): EMA12 − EMA26 of close, signal = EMA9 of the MACD
    * line, histogram = MACD − signal. EMAs seed at the series' first value
    * with α = 2/(n+1). The signal line is a second-order recurrence — a fold
    * over per-row results of two prior folds — realized as a prefix list
    * over the computed macd column.
    */
  def macd(candles: DataFrame,
      fast: Int = 12, slow: Int = 26, sig: Int = 9): DataFrame = {
    // α embedded as a pre-divided double literal (D suffix): Spark SQL
    // parses `2.0 / 13.0` as DECIMAL÷DECIMAL and truncates the quotient at
    // scale 6, while DuckDB promotes to DOUBLE — the shortest-round-trip
    // literal of the IEEE quotient is the same double DuckDB computes.
    def emaLam(n: Int) = s"(acc, x) -> acc + ${2.0 / (n + 1)}D * (x - acc)"
    candles
      .withColumn("px", collect_list(col("close_price")).over(prefix))
      .withColumn("macd",
        foldCol("px", emaLam(fast)) - foldCol("px", emaLam(slow)))
      .withColumn("ml", collect_list(col("macd")).over(prefix))
      .withColumn("signal", foldCol("ml", emaLam(sig)))
      .select(col("candle_start"), col("close_price"),
        graft.Parity.pround(col("macd"), 6).as("macd"),
        graft.Parity.pround(col("signal"), 6).as("macd_signal"),
        graft.Parity.pround(col("macd") - col("signal"), 6).as("macd_hist"))
  }
}
