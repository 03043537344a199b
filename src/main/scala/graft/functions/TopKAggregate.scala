package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Per-group top-k as a custom Catalyst `TypedImperativeAggregate`: a
  * bounded buffer of the k best (score, id) pairs, updated in O(k) per row
  * and merged in O(k²) — constant for fixed k — per partial pair.
  *
  * Why it exists: the declarative form of per-group top-k is a row_number
  * window + filter, which Spark 4 already executes well (WindowGroupLimit
  * inserts partial limits before the exchange) — but the exchange still
  * carries up to k FULL ROWS per (partition, group), and the window path
  * needs a per-partition SORT. This aggregate is the other classic shape:
  * map-side partial top-k with O(k) state per group, no sort anywhere, the
  * exchange carrying one k-bounded buffer per (partition, group) — the
  * form that wins when groups are huge and k is small (the 100 TB "top 3
  * per key over a billion rows per key" case). Being a
  * TypedImperativeAggregate it participates in ObjectHashAggregate with
  * map-side partial aggregation exactly like the built-in
  * `percentile`/`collect_set` family.
  *
  * Ordering contract (shared with the window formulation and the DuckDB
  * oracle): better = higher score, ties broken toward the LOWER id — a
  * total order, so results are deterministic on any input. Exposed via
  * [[TopKBy.topkByScore]]; `topk_orders_heap` shares
  * `topk_orders_per_customer`'s oracle, which is what proves the fused
  * operator equals the windowed plan bit-for-bit (the `ohlc_1h_fused`
  * pattern).
  */
case class TopKByAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]]
    with ImplicitCastInputTypes {

  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(score, id)

  /** Analyzer-inserted casts: `topk_by(int_score, id, 3)` coerces the
    * score to double and the id to long instead of dying at execution
    * with a ClassCastException in [[update]].
    */
  override def inputTypes: Seq[GraftSqlBridge.AbstractType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  /** Total order: true iff a outranks b (higher score, then lower id). */
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf += e
    else {
      var worst = 0
      var i = 1
      while (i < buf.size) {
        if (beats(buf(worst), buf(i))) worst = i
        i += 1
      }
      if (beats(e, buf(worst))) buf(worst) = e
    }

  override def update(
      buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(
      buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.sortWith(beats)
      .map { case (s, i) => InternalRow(i, s) }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val id = in.readLong()
      buf += ((s, id))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKBy {
  /** Column API: `topkByScore(score, id, k)` → array<struct<id, score>>
    * sorted best-first by (score desc, id asc).
    */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(AggregateExpression(
      TopKByAgg(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k),
      Complete, isDistinct = false))
}
