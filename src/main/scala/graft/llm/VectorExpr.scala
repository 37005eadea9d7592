package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native dot product — codegen'd Catalyst `Expression` twin of the
 * `aggregate(zip_with(a, b, (x, y) -> x*y), 0d, (acc, v) -> acc + v)`
 * composition [[Ann.dot]] started as. The HOF form materializes an
 * intermediate product ARRAY per evaluation and folds it interpreted;
 * in an all-pairs or rerank stage that is one allocation per candidate
 * pair (l84 at sf0.1: ~1M pairs × 3 folds). This is one tight primitive
 * loop, no allocation, accumulating left-to-right — float-for-float the
 * SAME sum as the HOF fold (same widening casts, same order), so scores
 * hash-match the previous form and the DuckDB `list_dot_product` oracle.
 *
 * Divergence from the HOF form, deliberate: ragged lengths or a NULL
 * element return NULL there (zip_with pads, acc + NULL = NULL) but THROW
 * here — silently nulling a corrupt embedding hides data corruption from
 * the pipeline; failing names the row shape instead. NULL arrays still
 * yield NULL (standard binary-expression null propagation).
 */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires two array<float|double> args, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private lazy val leftFloat = elem(left.dataType).get
  private lazy val rightFloat = elem(right.dataType).get

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.llm.DotProductExpr.compute($a, $b, $leftFloat, $rightFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {

  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"graft_dot: NULL element at index $i")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
