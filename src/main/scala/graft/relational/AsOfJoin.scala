package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — the canonical time-series operator Spark lacks
  * natively: for every left row, attach the latest right row whose
  * timestamp is ≤ the left timestamp, per key.
  *
  * Per the custom-operator preference order (compose built-ins before
  * custom plans), this is the union + ordered-window formulation:
  * tag both sides, union them, sort per key by (ts, side) with right rows
  * first at equal timestamps (inclusive ≤ semantics), and carry the right
  * payload forward with `last(_, ignoreNulls)` over an unbounded-preceding
  * ROWS frame; keep left rows.
  *
  * Cost at scale: ONE shuffle on the key (same as any keyed op) and one
  * sort — no range join, no per-row probe. Right-side payload must be
  * unique per (key, ts) for determinism (true for candle tables keyed by
  * bucket).
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String,
      keys: Seq[String], rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAligned = rightPayload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right
      .select((keys.map(col) ++ rightPayload.map(col) :+ col(rightTs).as("__ts")): _*)
      .withColumn("__side", lit(0))
    val rAligned = leftCols.filterNot(keys.contains).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /** Convenience: as-of join with renamed right timestamp retained. */
  def backwardWithTs(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, keys: Seq[String],
      rightPayload: Seq[String], tsOutName: String): DataFrame = {
    val r = right.withColumn(tsOutName, col(rightTs))
    backward(left, r, leftTs, rightTs, keys, rightPayload :+ tsOutName)
  }

  /** FORWARD as-of: for every left row, the EARLIEST right row STRICTLY
    * after it, per key — the "what happened next" operator sequence
    * pattern matching builds on. Same union + ordered-window shape (one
    * key shuffle, one sort), mirrored: the frame looks FORWARD
    * (currentRow → unboundedFollowing) and carries with
    * `first(_, ignoreNulls)`; at equal timestamps right rows sort BEFORE
    * left rows, which places them OUTSIDE the left row's following frame
    * — that exclusion is what makes the match strict (ts > left ts), the
    * contract funnels need (an event can't be its own successor).
    */
  def forwardWithTs(
      left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, keys: Seq[String],
      rightPayload: Seq[String], tsOutName: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = rightPayload :+ tsOutName
    val rBase = right.withColumn(tsOutName, col(rightTs))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(rBase.schema(c).dataType)))
    val r = rBase
      .select((keys.map(col) ++ payload.map(col) :+ col(rightTs).as("__ts")): _*)
      .withColumn("__side", lit(0))
    val rAligned = leftCols.filterNot(keys.contains).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.unionByName(
      rAligned.select(lAligned.columns.toIndexedSeq.map(col): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(unioned)((df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w)))
    carried.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
