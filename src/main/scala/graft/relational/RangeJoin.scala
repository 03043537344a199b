package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * Spark has no native range join: `a.ts BETWEEN b.start AND b.end` as a
  * raw join condition plans as BroadcastNestedLoopJoin — O(|L|·|R|) and a
  * driver OOM once neither side broadcasts. The standard scale technique is
  * TIME BINNING: each interval explodes to the (few) fixed-width bins it
  * covers, each point maps to exactly ONE bin, and the join becomes a plain
  * equi-join on (keys…, bin) followed by the residual interval predicate —
  * one hash shuffle, no cross product, each true match produced exactly
  * once (the point's bin is unique, so no post-join dedup is needed).
  *
  * `binWidthUs` trades shuffle width for fan-out: intervals explode to
  * floor(end/W)−floor(start/W)+1 rows, so pick it near the typical interval
  * span. At 100 TB both sides stay fully distributed; skewed keys fall
  * under the same salting/AQE remedies as any equi-join.
  */
object RangeJoin {

  /** Join `points` (with timestamp column `tsCol`) to `intervals` (with
    * `[startCol, endCol]`, inclusive) on equal `keys` plus containment.
    * Output: every points row joined with its containing interval's columns.
    * Integer `DIV` binning on both sides — identical flooring for the point
    * and the interval ends (positive epochs).
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      tsCol: String, startCol: String, endCol: String,
      binWidthUs: Long): DataFrame = {
    require(binWidthUs > 0, "binWidthUs must be positive")
    require(!points.columns.contains("graft_bin") &&
      !intervals.columns.contains("graft_bin"),
      "inputs must not already carry the working column 'graft_bin'")
    // the residual predicate references tsCol/startCol/endCol by bare name:
    // any non-key column shared between the two sides would be ambiguous
    val shared = (points.columns.toSet & intervals.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key columns shared between both sides would be ambiguous after " +
        s"the join: ${shared.mkString(", ")}")
    val l = points.withColumn("graft_bin",
      expr(s"unix_micros(`$tsCol`) DIV ${binWidthUs}L"))
    val r = intervals.withColumn("graft_bin", explode(expr(
      s"sequence(unix_micros(`$startCol`) DIV ${binWidthUs}L, " +
        s"unix_micros(`$endCol`) DIV ${binWidthUs}L)")))
    l.join(r, keys :+ "graft_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("graft_bin")
  }
}
