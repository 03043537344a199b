package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric parity helpers.
  *
  * `round(x, n)` is NOT portable even on bit-identical inputs: Spark rounds
  * HALF_UP on the shortest decimal representation (BigDecimal of
  * Double.toString), DuckDB multiplies by 10^n and rounds the scaled float —
  * at exact half-boundaries (common for ratios of small integers) the two
  * disagree. `pround` is the same IEEE expression on both engines —
  * floor(x·10ⁿ + 0.5)/10ⁿ — so identical inputs give identical outputs,
  * always.
  *
  * Use only where both sides compute bit-identical doubles (sequential
  * folds, exact-decimal sums cast back, pure per-row arithmetic). Where the
  * raw doubles may differ in the last ulp, fix the computation first
  * (association-independent decimal sums — see Indicators.sma), then pround.
  */
object Parity {

  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def proundSql(e: String, n: Int): String = {
    val p = s"1e$n"
    s"floor(($e) * $p + 0.5) / $p"
  }
}
