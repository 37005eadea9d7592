package graft.llm

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 64-bit SimHash over a token array — a codegen'd Catalyst
 * `Expression` replacing the higher-order-function fold, which allocates
 * two 64-int Catalyst arrays per token. This implementation keeps the
 * 64 vote counters in a stack-local int[] inside one tight loop
 * (~5× the fold at sf0.1; see PERF.md).
 *
 * Semantics: per bit i, vote = Σ over tokens of (bit_i(xxhash64(token))
 * ? +1 : -1); result bit i set iff vote > 0. Uses Spark's own XxHash64
 * (seed 42) so values match `xxhash64(token)`-based pipelines.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(t, StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Register `graft_simhash64(array<string>)` as a session function.
    * Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", (children: Seq[Expression]) => SimHash64(children.head), "scala_udf")

  /** Column form over a named token-array column (register first). */
  def simhashCol(spark: org.apache.spark.sql.SparkSession, tokensCol: String): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"graft_simhash64(`$tokensCol`)")
  }
}

/**
 * Native form of [[TextOps.portableHash60]]: first 15 hex chars of md5 as a
 * 60-bit long, computed with a direct digest + nibble parse instead of the
 * hex-string → `conv` round-trip (one fewer string materialization per
 * shingle on the portable-twin hot path; values identical — property-tested
 * against the Column-expression definition).
 */
case class PortableHash60Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_phash60 requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash60"

  override def nullSafeEval(input: Any): Any =
    SimHashPortable60.hash60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHashPortable60.hash60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60Expr =
    copy(child = newChild)
}

object PortableHash60Expr {
  /** Register `graft_phash60(string)` as a session function. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_phash60", (children: Seq[Expression]) => PortableHash60Expr(children.head), "scala_udf")
}

/**
 * Portable twin of [[SimHash64]]: identical vote loop, but per-token hashes
 * are [[TextOps.portableHash60]] (first 15 hex chars of md5 as a 60-bit
 * integer) instead of xxhash64 — every step reproducible in ANSI SQL, so
 * the whole SimHash near-dup pipeline gets a DuckDB exact twin. Bits 60–63
 * are always 0 (votes strictly negative), on both engines alike.
 */
case class SimHashPortable60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_p60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_p60"

  override def nullSafeEval(input: Any): Any =
    SimHashPortable60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.SimHashPortable60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashPortable60 =
    copy(child = newChild)
}

object SimHashPortable60 {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5(bytes) as a long — numerically identical to
    * Spark's `conv(substring(md5(s), 1, 15), 16, 10)` and DuckDB's
    * `('0x'||substr(md5(s),1,15))::BIGINT`: 7 full bytes then the high
    * nibble of byte 7, big-endian. PUBLIC because generated Java calls it
    * through the static forwarder — `private[llm]` gets no forwarder and
    * Janino then fails, silently dropping every portable plan out of
    * whole-stage codegen. */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v << 4) | ((dig(7) >>> 4) & 0xfL)
  }

  /** Static helper shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Register `graft_simhash_p60(array<string>)` as a session function.
    * Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash_p60", (children: Seq[Expression]) => SimHashPortable60(children.head), "scala_udf")

  /** Column form over a named token-array column (register first). */
  def simhashCol(spark: org.apache.spark.sql.SparkSession, tokensCol: String): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.expr(s"graft_simhash_p60(`$tokensCol`)")
  }
}
