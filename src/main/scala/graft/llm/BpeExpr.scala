package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native BPE token-count expression: whole-stage-codegen'd call into
 * [[BpeTable.countTokens]]. The merges table travels as a plan REFERENCE
 * object (one per expression instance, shipped once per executor in the
 * serialized plan) — not as 2·k string literals in the expression tree, so
 * plan size and codegen cost are O(1) in the merge-table size; real
 * vocabularies (10⁴–10⁵ merges) stay viable.
 *
 * No UDF: interpreted eval and generated code share the same static-shape
 * call, and the per-JVM distinct-word memo inside [[BpeTable]] amortizes
 * the merge loop across repeated words.
 */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_count requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val table = new BpeTable(merges)

  override def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$tableRef.countTokens($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

object BpeCountExpr {
  /** Register `graft_bpe_count(string)` (backed by [[Bpe.DefaultMerges]])
    * as a session function. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_count",
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_bpe_count(text) takes exactly 1 argument, got ${children.length}")
        BpeCountExpr(children.head, Bpe.DefaultMerges)
      },
      "scala_udf")
}

/** Full-encoding twin of [[BpeCountExpr]]: the document's BPE token
  * sequence as one space-joined string (tokens are whitespace-free, so the
  * join is lossless). Same reference-object merges plumbing. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val table = new BpeTable(merges)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(table.encodeJoined(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($tableRef.encodeJoined($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
