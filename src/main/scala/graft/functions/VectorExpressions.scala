package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for vector dot products (SURVEY §7.4 scale
  * path; prompt preference order: built-ins < custom Expression < UDF).
  *
  * The composable alternative — `aggregate(sequence(1, size(a)), 0d, ...)` —
  * is a HigherOrderFunction: it is NOT whole-stage-codegen'd, allocates a
  * lambda frame per element, and materializes a `sequence` array per row.
  * For 100 TB of 64-dim embeddings that is the difference between a fused
  * per-row loop and an interpreter. This expression generates a tight Java
  * loop (`doGenCode`), with an interpreted `nullSafeEval` fallback.
  *
  * Semantics (MUST stay bit-identical to the DuckDB oracle and to the HOF
  * form): strict sequential left fold `acc = 0.0; acc += (double)a[i] *
  * (double)b[i]` — same association order, double arithmetic throughout.
  * Accepts float and/or double array inputs (embeddings are float32,
  * LSH hyperplanes double).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(e: Expression, arr: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(left, a, i)} * ${get(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Integer sibling of [[VecDot]]: exact BIGINT dot product over two
  * long-array columns — the scalar-quantization scoring hot loop
  * (`ann_sq_topk`: code·code per candidate pair). The HOF form
  * (`aggregate(zip_with(...))`) is CodegenFallback AND materializes the
  * zipped array per row; this is a fused long loop. Integer addition is
  * associative, so unlike VecDot there is no fold-order contract to
  * preserve — only exactness, which long arithmetic gives for free
  * (codes ≤ 255, dims ≤ 2²⁰ keep every partial < 2⁵⁵).
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level dot product over float/double array columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Exact BIGINT dot product over two long-array columns. */
  def vecDotLong(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      VecDotLong(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
