package graft.llm

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * Exact fixed-point base-2 logarithm in micro-units — the ULP-robust
 * replacement for libm `ln` in cross-engine-compared score columns.
 *
 * `graft_log2micro(n)` for integer n ≥ 1 returns an integer defined by a
 * PURE int64 recurrence (no floating point anywhere), so any engine that
 * replays the recurrence — a DuckDB recursive CTE does it in ~10 lines —
 * produces the identical value bit-for-bit. This kills the failure mode
 * that bit l104 in round 9: `round(ln(x), 6)` flips a digit when two
 * libm builds disagree by one ULP at a 6-dp rounding boundary.
 *
 * Definition (the classic digit-by-digit / repeated-squaring binary log,
 * e.g. Majithia & Levan 1973, public):
 *   e0  = floor(log2 n)                 (bit length − 1)
 *   r   = n normalized into [2³⁰, 2³¹)  (30-bit fixed point of n/2^e0)
 *   20×: r ← (r·r) >> 30; if r ≥ 2³¹ then r >>= 1 and emit bit 1 else 0
 *   L   = e0·2²⁰ + (the 20 emitted bits)           ≈ 2²⁰·log2 n
 *   out = (L·10⁶) >> 20                            ≈ 10⁶·log2 n
 *
 * The 30-bit truncation makes `out` differ from true 10⁶·log2(n) by a
 * few micro-units — deliberately: the value is DEFINED by the integer
 * recurrence, not by a real-number ideal, so exactness is decidable.
 * Monotone nondecreasing in n (every step — initial shift, squaring,
 * conditional halve — preserves order), and exact at powers of two.
 *
 * Scale: one O(20) int64 loop per input, codegen'd — strictly cheaper
 * than a libm call. Inputs ≤ 0 (never produced by count+1 callers)
 * return Long.MinValue as an explicit poison rather than throwing
 * mid-scan.
 */
case class Log2Micro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_log2micro requires bigint, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_log2micro"

  override def nullSafeEval(input: Any): Any =
    Log2Micro.compute(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.Log2Micro.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Log2Micro =
    copy(child = newChild)
}

object Log2Micro {

  /** Static helper shared by interpreted eval and generated code. */
  def compute(n: Long): Long = {
    if (n <= 0L) return Long.MinValue
    val e0 = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var r: Long = if (e0 >= 30) n >>> (e0 - 30) else n << (30 - e0)
    var acc: Long = e0.toLong << 20
    var i = 1
    while (i <= 20) {
      r = (r * r) >> 30
      if (r >= (1L << 31)) { r >>= 1; acc += 1L << (20 - i) }
      i += 1
    }
    (acc * 1000000L) >> 20
  }

  /** Register `graft_log2micro(bigint)` as a session function. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_log2micro", (children: Seq[Expression]) => Log2Micro(children.head), "scala_udf")

  /** The DuckDB replay of [[compute]] over a one-column relation `ns(n)`:
    * paste into a `WITH RECURSIVE` chain; exposes `lg(n, l2m)`. Kept here
    * so oracle SQL and engine code can never drift apart. */
  def duckSqlCtes(nsRelation: String): String = duckSqlCtes(nsRelation, "lg")

  /** [[duckSqlCtes]] with a caller-chosen CTE prefix, for oracles that
    * need TWO independent log2 tables in one WITH RECURSIVE (a later
    * stage's inputs depend on the earlier stage's outputs, so one shared
    * `ns` would be cyclic — the unigram EM trainer's seed vs M-step
    * costs). Exposes `<prefix>(n, l2m)`. */
  def duckSqlCtes(nsRelation: String, prefix: String): String = {
    val lgit = s"${prefix}it"
    val lg = prefix
    s"""$lgit AS (
       |  SELECT n, 0 AS i,
       |    CASE WHEN length(bin(n)) - 1 >= 30
       |      THEN n >> (length(bin(n)) - 31)
       |      ELSE n << (31 - length(bin(n))) END AS r,
       |    CAST(length(bin(n)) - 1 AS BIGINT) * 1048576 AS acc
       |  FROM $nsRelation
       |  UNION ALL
       |  SELECT n, i + 1,
       |    CASE WHEN ((r*r) >> 30) >= 2147483648 THEN ((r*r) >> 30) >> 1
       |         ELSE (r*r) >> 30 END,
       |    acc + CASE WHEN ((r*r) >> 30) >= 2147483648
       |               THEN (CAST(1 AS BIGINT) << (20 - (i+1))) ELSE 0 END
       |  FROM $lgit WHERE i < 20),
       |$lg AS (SELECT n, (acc * 1000000) >> 20 AS l2m FROM $lgit WHERE i = 20)""".stripMargin
  }

}
