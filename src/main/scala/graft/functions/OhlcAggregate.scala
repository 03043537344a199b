package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.types._

/** Single-buffer OHLC aggregate (custom Catalyst `DeclarativeAggregate`).
  *
  * The composed form (Ohlc.candles) runs four aggregate functions —
  * min_by(open, ts), max(high), min(low), max_by(close, ts) — each with its
  * own buffer and update path. This fuses the candle into ONE aggregate
  * with a 7-slot buffer; being declarative (pure expressions, no
  * ImperativeAggregate), every update/merge participates in whole-stage
  * codegen and map-side partial aggregation exactly like the built-ins.
  *
  * Semantics match the reference exactly (fct_eurusd_timeframes.sql:59-71):
  * open = price at min ts, close = price at max ts, high/low = extremes,
  * count — asserted by sharing the composed query's DuckDB oracle.
  */
case class OhlcAgg(
    ts: Expression,
    open: Expression, high: Expression, low: Expression, close: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ts, open, high, low, close)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("open_price", DoubleType),
    StructField("high_price", DoubleType),
    StructField("low_price", DoubleType),
    StructField("close_price", DoubleType),
    StructField("ticks_5m_count", LongType)))

  private val minTs = AttributeReference("minTs", TimestampType)()
  private val openV = AttributeReference("openV", DoubleType)()
  private val maxHigh = AttributeReference("maxHigh", DoubleType)()
  private val minLow = AttributeReference("minLow", DoubleType)()
  private val maxTs = AttributeReference("maxTs", TimestampType)()
  private val closeV = AttributeReference("closeV", DoubleType)()
  private val cnt = AttributeReference("cnt", LongType)()

  override val aggBufferAttributes: Seq[AttributeReference] =
    Seq(minTs, openV, maxHigh, minLow, maxTs, closeV, cnt)

  override val initialValues: Seq[Expression] = Seq(
    Literal.create(null, TimestampType), Literal.create(null, DoubleType),
    Literal.create(null, DoubleType), Literal.create(null, DoubleType),
    Literal.create(null, TimestampType), Literal.create(null, DoubleType),
    Literal(0L))

  override val updateExpressions: Seq[Expression] = {
    val earlier = Or(IsNull(minTs), LessThan(ts, minTs))
    val later = Or(IsNull(maxTs), GreaterThan(ts, maxTs))
    Seq(
      If(earlier, ts, minTs),
      If(earlier, open, openV),
      If(Or(IsNull(maxHigh), GreaterThan(high, maxHigh)), high, maxHigh),
      If(Or(IsNull(minLow), LessThan(low, minLow)), low, minLow),
      If(later, ts, maxTs),
      If(later, close, closeV),
      Add(cnt, Literal(1L)))
  }

  override val mergeExpressions: Seq[Expression] = {
    val leftEarlier = Or(IsNull(minTs.right), And(IsNotNull(minTs.left), LessThan(minTs.left, minTs.right)))
    val leftLater = Or(IsNull(maxTs.right), And(IsNotNull(maxTs.left), GreaterThan(maxTs.left, maxTs.right)))
    Seq(
      If(leftEarlier, minTs.left, minTs.right),
      If(leftEarlier, openV.left, openV.right),
      If(Or(IsNull(maxHigh.right), And(IsNotNull(maxHigh.left), GreaterThan(maxHigh.left, maxHigh.right))),
        maxHigh.left, maxHigh.right),
      If(Or(IsNull(minLow.right), And(IsNotNull(minLow.left), LessThan(minLow.left, minLow.right))),
        minLow.left, minLow.right),
      If(leftLater, maxTs.left, maxTs.right),
      If(leftLater, closeV.left, closeV.right),
      Add(cnt.left, cnt.right))
  }

  override val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("open_price"), openV,
      Literal("high_price"), maxHigh,
      Literal("low_price"), minLow,
      Literal("close_price"), closeV,
      Literal("ticks_5m_count"), cnt))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OhlcAgg =
    copy(ts = newChildren(0), open = newChildren(1), high = newChildren(2),
      low = newChildren(3), close = newChildren(4))
}

object OhlcAggregate {
  /** Column API: `ohlc(ts, open, high, low, close)` → candle struct. */
  def ohlc(ts: Column, open: Column, high: Column, low: Column, close: Column): Column = {
    val agg = OhlcAgg(
      GraftSqlBridge.expression(ts),
      GraftSqlBridge.expression(open), GraftSqlBridge.expression(high),
      GraftSqlBridge.expression(low), GraftSqlBridge.expression(close))
    GraftSqlBridge.column(AggregateExpression(agg, Complete, isDistinct = false))
  }
}
