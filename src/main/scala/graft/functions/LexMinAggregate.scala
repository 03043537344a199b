package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, DeclarativeAggregate}
import org.apache.spark.sql.types._

/** Lexicographic argmin with a FLAT mutable buffer (custom Catalyst
  * `DeclarativeAggregate`) — the hash-aggregable replacement for
  * `min_by(v, struct(k1, k2))`.
  *
  * The built-in min_by/max_by over a STRUCT ordering key carries the
  * struct in its aggregation buffer; struct buffer fields are not
  * UnsafeRow-mutable, so Spark falls back to SortAggregate — which first
  * SORTS the entire input stream by the grouping key and then aggregates
  * outside whole-stage codegen. On the iterative-graph hot paths (the
  * random-walk candidate stream is ~9M rows per hub step at sf0.1) that
  * sort is the dominant cost of the step. This aggregate keeps the exact
  * one-pass argmin semantics but buffers (k1: double, k2: long) as two
  * mutable primitives, so it plans as HashAggregate with map-side partial
  * combine and codegen, exactly like the built-ins (guide §4: prefer
  * codegen-friendly expressions on hot paths; the OhlcAgg precedent).
  *
  * Semantics: over rows where neither key is null, returns the k2 of the
  * lexicographically smallest (k1, k2); null for an empty group — i.e.
  * `min_by(k2, struct(k1, k2))` verbatim. Rows with a null key are
  * ignored (struct orderings at every call site are non-null by
  * construction). EXACTNESS CONTRACT: k1 arrives as DoubleType; callers
  * passing integral keys must stay within 2^53 so the long→double
  * injection is strictly monotone (hash32 values < 2^32, per-vertex
  * counts and vertex ids are far below 2^53 at any scale factor — and at
  * 100 TB a vertex id above 2^53 would overflow the id space long before
  * this buffer). Ties in k1 resolve by the exact LONG k2, so no
  * double-rounding can change the selected value. NaN orders largest,
  * matching Spark's struct ordering.
  */
case class LexMinLong(k1: Expression, k2: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(k1, k2)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  private val bk1 = AttributeReference("bk1", DoubleType)()
  private val bk2 = AttributeReference("bk2", LongType)()

  override val aggBufferAttributes: Seq[AttributeReference] = Seq(bk1, bk2)

  override val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, LongType))

  override val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(k1), IsNotNull(k2))
    val better = Or(IsNull(bk1),
      Or(LessThan(k1, bk1), And(EqualTo(k1, bk1), LessThan(k2, bk2))))
    val take = And(valid, better)
    Seq(If(take, k1, bk1), If(take, k2, bk2))
  }

  override val mergeExpressions: Seq[Expression] = {
    val leftBetter = And(IsNotNull(bk1.left),
      Or(IsNull(bk1.right),
        Or(LessThan(bk1.left, bk1.right),
          And(EqualTo(bk1.left, bk1.right), LessThan(bk2.left, bk2.right)))))
    Seq(If(leftBetter, bk1.left, bk1.right),
      If(leftBetter, bk2.left, bk2.right))
  }

  override val evaluateExpression: Expression = bk2

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LexMinLong =
    copy(k1 = newChildren(0), k2 = newChildren(1))
}

object LexMinAggregate {
  /** Column API: `argMinLong(k1, k2)` ==
    * `min_by(k2, struct(k1, k2))` with k1 cast to double — see
    * [[LexMinLong]] for the exactness contract.
    */
  def argMinLong(k1: Column, k2: Column): Column =
    GraftSqlBridge.column(AggregateExpression(
      LexMinLong(
        GraftSqlBridge.expression(k1.cast("double")),
        GraftSqlBridge.expression(k2)),
      Complete, isDistinct = false))
}
