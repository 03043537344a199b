package graft.forex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling-window time bucketing + the 7-way timeframe fan-out.
  *
  * Reference semantics (models/marts/fct_eurusd_timeframes.sql:32-57):
  *  - ticks are shifted +2h ("NY close" alignment), truncated to the
  *    timeframe grid, then shifted back −2h;
  *  - 5m/15m/30m buckets anchor to the hour, 1h to the hour, 4h/12h to the
  *    (shifted) day, and 24h to the pure-UTC day (unshifted,
  *    fct_eurusd_timeframes.sql:55-56).
  *
  * Because the 2h shift is a whole number of hours, it cancels algebraically
  * for every sub-day timeframe (trunc_hour(ts+2h) = trunc_hour(ts)+2h and
  * minute(ts+2h)=minute(ts)), and for 4h/12h it only moves the grid anchor.
  * So every bucket reduces to one closed form on epoch microseconds:
  *
  *   bucket(ts) = (us+S) − (us+S) mod W − S      where us = unix_micros(ts)
  *
  * with W the timeframe width and S the anchor shift (2h for 4h/12h, else 0).
  * Pure long arithmetic: a single whole-stage-codegen'd expression, no
  * interval types, no UDF — at 100 TB this is the cheapest possible bucket
  * computation and never breaks codegen.
  */
object Resample {

  final case class Timeframe(name: String, widthUs: Long, shiftUs: Long)

  private final val Minute = 60L * 1000000L
  private final val Hour = 60L * Minute

  /** All 7 reference timeframes (fct_eurusd_timeframes.sql:40-57). */
  val timeframes: Seq[Timeframe] = Seq(
    Timeframe("5m", 5 * Minute, 0L),
    Timeframe("15m", 15 * Minute, 0L),
    Timeframe("30m", 30 * Minute, 0L),
    Timeframe("1h", 1 * Hour, 0L),
    Timeframe("4h", 4 * Hour, 2 * Hour),
    Timeframe("12h", 12 * Hour, 2 * Hour),
    Timeframe("24h", 24 * Hour, 0L))

  def byName(name: String): Timeframe =
    timeframes.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown timeframe $name"))

  /** Floor `ts` onto the timeframe grid. */
  def bucket(ts: Column, tf: Timeframe): Column = {
    val shifted = unix_micros(ts) + lit(tf.shiftUs)
    timestamp_micros(shifted - (shifted % lit(tf.widthUs)) - lit(tf.shiftUs))
  }

  /** Fan one tick row out to the 7 (timeframe, candle_start) tags.
    *
    * The reference does this with a 7-branch UNION ALL
    * (fct_eurusd_timeframes.sql:40-57) which re-scans the source 7 times.
    * At 100 TB that is 7 full scans, so we instead generate the 7 tags
    * per-row with one `explode` over an inline array — one scan, same bag
    * of rows, still fully codegen-compatible up to the generate.
    */
  def fanout(silver: DataFrame, tfs: Seq[Timeframe] = timeframes,
      keyCols: Seq[String] = Nil): DataFrame = {
    val tags = array(tfs.map { tf =>
      struct(
        lit(tf.name).as("timeframe"),
        bucket(col("observed_at"), tf).as("candle_start"))
    }: _*)
    silver
      .select(explode(tags).as("tfb"), col("*"))
      .select(keyCols.map(col) ++ Seq(
        col("tfb.timeframe").as("timeframe"),
        col("tfb.candle_start").as("candle_start"),
        col("observed_at"),
        col("open_price"), col("high_price"), col("low_price"), col("close_price")): _*)
  }
}
