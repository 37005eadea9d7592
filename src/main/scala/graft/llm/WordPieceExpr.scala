package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native WordPiece expressions (the [[BpeExpr]] pattern): whole-stage-
 * codegen'd calls into [[WordPieceVocab]], with the vocabulary riding the
 * plan as ONE reference object — plan size and codegen cost are O(1) in
 * vocab size, so real 30k-piece BERT vocabs stay viable. No UDF: the
 * interpreted eval and the generated code share the same call, and the
 * per-JVM distinct-word memo amortizes the greedy scan.
 */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_encode requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_wordpiece_encode"

  @transient private lazy val table = new WordPieceVocab(vocab)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(table.encodeJoined(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", table, classOf[WordPieceVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString($ref.encodeJoined($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

/** Token-count twin of [[WordPieceEncodeExpr]]. */
case class WordPieceCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece_count requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_wordpiece_count"

  @transient private lazy val table = new WordPieceVocab(vocab)

  override def nullSafeEval(input: Any): Any =
    table.countTokens(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", table, classOf[WordPieceVocab].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCountExpr =
    copy(child = newChild)
}
