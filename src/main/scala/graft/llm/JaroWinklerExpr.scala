package graft.llm

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro–Winkler similarity (Winkler 1990) in exact integer micro-units as
 * a codegen'd Catalyst `Expression` — the scorer behind fuzzy record
 * linkage (j17). Returns `round(1e6 · jw)` computed in pure rational
 * arithmetic, so two engines can agree bit-for-bit without sharing a
 * floating-point summation order:
 *
 *   jaro = (m/l1 + m/l2 + (m−t)/m) / 3  =  N / D
 *     with N = m²·l2 + m²·l1 + (m−t)·l1·l2  and  D = 3·l1·l2·m,
 *   jw   = jaro                    when 10·N ≤ 7·D (no Winkler boost)
 *        = (N·(10−ℓ) + ℓ·D)/(10·D) otherwise (prefix ℓ ≤ 4, weight 0.1),
 *   out  = round-half-up(1e6 · jw) as a BIGINT.
 *
 * Semantics pinned to DuckDB's `jaro_winkler_similarity` (the oracle):
 * BYTE-wise comparison (a 2-byte UTF-8 char counts as two symbols),
 * greedy left-to-right matching inside a ⌊max(l1,l2)/2⌋−1 window,
 * transpositions t = ⌊mismatched-matched-positions / 2⌋ (integer), boost
 * only when jaro exceeds 0.7, and 0 for any empty input (both-empty
 * included). One caveat: DuckDB evaluates the 0.7 boost gate in doubles,
 * so a pair whose jaro is EXACTLY 7/10 may round either way there; this
 * expression uses the exact gate (10·N > 7·D). Callers that oracle
 * against DuckDB must assert their data has no exact-boundary pair
 * (LinkageSpec does, over the full fuzzy-join pair set).
 *
 * Inputs are capped at 4096 bytes (the rational numerators stay inside
 * Long: 2e6·num < 2^63 at l=4096) — longer input throws rather than
 * silently truncating; linkage callers pre-truncate their key column.
 */
case class JaroWinklerMicro(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_jaro_winkler_micro requires (string, string), got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_jaro_winkler_micro"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerMicro.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.llm.JaroWinklerMicro.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinklerMicro =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerMicro {

  final val MaxBytes = 4096

  /** Static helper shared by interpreted eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val r = rational(a, b)
    if (r == null) return 0L
    // round-half-up of 1e6 · num / den in exact integer arithmetic
    (2L * 1000000L * r(2) + r(3)) / (2L * r(3))
  }

  /**
   * The exact rational underlying the score, or null when either input is
   * empty or no bytes match (score 0): `[n, d, num, den]` with `n/d` the
   * plain Jaro and `num/den` the Jaro–Winkler after any boost. Exposed so
   * LinkageSpec can assert its two floating-point-caveat guards (exact
   * 0.7 gate boundary; exact .5 micro-rounding fraction) on real data.
   */
  def rational(a: UTF8String, b: UTF8String): Array[Long] = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    require(l1 <= MaxBytes && l2 <= MaxBytes,
      s"graft_jaro_winkler_micro input exceeds $MaxBytes bytes ($l1, $l2) — truncate the key column first")
    if (l1 == 0 || l2 == 0) return null

    // greedy windowed matching (the classic Jaro scan)
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val bMatched = new Array[Boolean](l2)
    val aMatchIdx = new Array[Int](math.min(l1, l2)) // a-side matched positions, in i order
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatched(j) && s1(i) == s2(j)) {
          bMatched(j) = true
          aMatchIdx(m) = i
          m += 1
          done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return null

    // transpositions: compare a's matched sequence (ascending i — the
    // fill order of aMatchIdx) with b's matched bytes in ascending j,
    // walked via the match flags (the greedy j indices are not sorted).
    var t2 = 0
    var k = 0
    var j2 = 0
    while (k < m) {
      while (!bMatched(j2)) j2 += 1
      if (s1(aMatchIdx(k)) != s2(j2)) t2 += 1
      j2 += 1
      k += 1
    }
    val t = t2 / 2

    val mL = m.toLong
    val n = mL * mL * l2 + mL * mL * l1 + (mL - t) * l1 * l2
    val d = 3L * l1 * l2 * mL

    // Winkler prefix boost, gated on jaro > 0.7 (exact: 10N > 7D)
    var num = n
    var den = d
    if (10L * n > 7L * d) {
      var prefix = 0
      val cap = math.min(4, math.min(l1, l2))
      while (prefix < cap && s1(prefix) == s2(prefix)) prefix += 1
      if (prefix > 0) {
        num = n * (10L - prefix) + prefix * d
        den = 10L * d
      }
    }
    Array(n, d, num, den)
  }

  /** True iff the pair's plain Jaro sits EXACTLY on the 0.7 boost
    * boundary — where DuckDB's double-evaluated gate may disagree with
    * the exact gate above. LinkageSpec asserts no data pair does. */
  def onBoostBoundary(a: UTF8String, b: UTF8String): Boolean = {
    val r = rational(a, b)
    r != null && 10L * r(0) == 7L * r(1)
  }

  /** True iff 1e6·jw lands EXACTLY on a .5 rounding fraction — where
    * DuckDB's double-based round may disagree with the exact half-up
    * rounding above. LinkageSpec asserts no data pair does. */
  def onRoundingBoundary(a: UTF8String, b: UTF8String): Boolean = {
    val r = rational(a, b)
    r != null && (2L * 1000000L * r(2)) % (2L * r(3)) == r(3)
  }

  /** Register `graft_jaro_winkler_micro(string, string)`. Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler_micro",
      (children: Seq[Expression]) => JaroWinklerMicro(children(0), children(1)), "scala_udf")

  /** Column form (register first). */
  def jwMicroCol(spark: org.apache.spark.sql.SparkSession,
                 a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("graft_jaro_winkler_micro", a, b)
  }
}
