package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval (attribution) join — the streaming operator
  * family beyond windowed aggregation: two unbounded inputs joined on a
  * key plus a time-range condition.
  *
  * Semantics: each purchase joins every click by the same user in the
  * 30 minutes leading up to it (classic last-touch attribution input).
  * Both sides carry watermarks and the join condition bounds event time on
  * BOTH sides, which is what lets Structured Streaming evict state: a
  * click's state can be dropped once the purchase-side watermark passes
  * c_ts + window, a purchase's once the click side passes p_ts — state is
  * O(events per watermark horizon), not O(stream history). Without the
  * time bound Spark rejects the append-mode join outright (unbounded
  * state).
  *
  * At 100 TB/day both sides shuffle on user_id once and the join runs
  * per-partition against the bounded state store — the same partitioning a
  * batch join would pick, plus eviction.
  */
object StreamJoin {

  /** purchases(purchase_id, p_ts, user_id) x clicks(click_id, c_ts,
    * c_user_id) → attributed pairs. Inner join: every matched pair is
    * emitted exactly once regardless of micro-batch boundaries.
    */
  def attribution(purchases: DataFrame, clicks: DataFrame,
      window: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("p_ts", lateness)
    val c = clicks.withWatermark("c_ts", lateness)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER stream-stream join — the semantics inner can't express:
    * every purchase is reported exactly once, attributed when a click
    * matched, with NULL click columns when none did. The null row for an
    * unmatched purchase can only be emitted once NO future click could
    * still match it — i.e. when the global watermark passes the end of
    * that purchase's attribution window — so outer results trail the
    * inner ones by the watermark delay BY DESIGN. State is evicted on the
    * identical schedule, so it stays O(events per watermark horizon)
    * exactly as in the inner form.
    *
    * Bounded-run caveat (gates, backfills): the watermark only advances
    * on observed event time, so the LAST horizon's unmatched purchases
    * would stay withheld forever at end-of-stream. A bounded run must
    * push the watermark past all real data — the gate query appends one
    * far-future SENTINEL row per side and filters it back out — which is
    * the same end-of-stream discipline `stream_open_gaps` applies.
    */
  def attributionOuter(purchases: DataFrame, clicks: DataFrame,
      window: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame = {
    val p = purchases.withWatermark("p_ts", lateness)
    val c = clicks.withWatermark("c_ts", lateness)
    p.join(c,
      col("user_id") === col("c_user_id") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("p_ts"), col("c_ts"))
  }
}
