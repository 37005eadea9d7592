package graft.llm

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native longest-common-subsequence length over two token arrays — the
 * core of ROUGE-L (Lin 2004) — as a codegen'd Catalyst `Expression`: the
 * classic O(m·n) single-row DP in one tight primitive-int loop (an
 * equivalent higher-order-function fold cannot even express the DP row's
 * left-neighbor carry without going O(m·n²), the reason this is native
 * from the start rather than a BpeExpr-style retrofit). Bounded inputs
 * are the caller's contract — [[Rouge]] truncates both sequences before
 * calling.
 */
case class LcsLen(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_lcs requires (array<string>, array<string>), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lcs"

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsLen.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.llm.LcsLen.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): LcsLen =
    copy(left = newLeft, right = newRight)
}

object LcsLen {

  /** Static helper shared by interpreted eval and generated code: rolling
    * one-row DP with a diagonal carry; null tokens never match. */
  def compute(cand: ArrayData, ref: ArrayData): Int = {
    val m = cand.numElements()
    val n = ref.numElements()
    if (m == 0 || n == 0) return 0
    val rt = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      rt(j) = if (ref.isNullAt(j)) null else ref.getUTF8String(j)
      j += 1
    }
    val dp = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ci = if (cand.isNullAt(i)) null else cand.getUTF8String(i)
      var prev = 0
      j = 1
      while (j <= n) {
        val tmp = dp(j)
        dp(j) =
          if (ci != null && rt(j - 1) != null && ci.equals(rt(j - 1))) prev + 1
          else if (dp(j) >= dp(j - 1)) dp(j) else dp(j - 1)
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(n)
  }

  /** Register `graft_lcs(array<string>, array<string>)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lcs", (children: Seq[Expression]) => LcsLen(children(0), children(1)), "scala_udf")

  /** Column form (register first). */
  def lcsCol(spark: org.apache.spark.sql.SparkSession,
             candCol: org.apache.spark.sql.Column,
             refCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    import org.apache.spark.sql.GraftExpressionBridge._
    column(LcsLen(expression(candCol), expression(refCol)))
  }
}
