package graft.llm

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Shippable unigram-LM Viterbi table ([[Unigram]]'s cost model as a plan
 * reference object, the [[BpeTable]] pattern): vocab in a hash map, the
 * per-word DP in tight JVM code, and a bounded per-JVM distinct-word memo —
 * the corpus repeats words heavily, so each distinct word pays the
 * O(len·maxLen) DP once per executor.
 *
 * The DP is BIT-IDENTICAL to [[Unigram.wordPacked]]'s expression fold
 * (packed `cost·2048 + pieces` cells, `Big` infeasible sentinel), which the
 * spec asserts — the HOF fold is kept as the independent definition this
 * native path is parity-tested against, the `portableHash60Sql` pattern.
 */
final class UnigramTable(val vocab: Seq[(String, Long)], val unkCost: Long,
                         val maxLen: Int) extends Serializable {

  @transient private lazy val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.putIfAbsent(p, java.lang.Long.valueOf(c)) }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private[this] val MaxCacheEntries = 1 << 16

  /** Packed Viterbi value `cost·2048 + pieces` of one (already lowercased)
    * word — [[Unigram.wordPacked]]'s exact arithmetic. */
  def wordPacked(w: String): Long = {
    val cached = memo.get(w)
    if (cached != null) return cached.longValue()
    val n = w.length
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var best = Unigram.Big
      var k = 1
      while (k <= maxLen && k <= i) {
        val c: java.lang.Long =
          if (k == 1) {
            val v = costs.get(w.substring(i - 1, i))
            if (v == null) java.lang.Long.valueOf(unkCost) else v
          } else costs.get(w.substring(i - k, i))
        if (c != null) {
          val cand = dp(i - k) + c.longValue() * Unigram.Pack + 1
          if (cand < best) best = cand
        }
        k += 1
      }
      dp(i) = best
      i += 1
    }
    if (memo.size() >= MaxCacheEntries) memo.clear()
    memo.put(w, java.lang.Long.valueOf(dp(n)))
    dp(n)
  }

  /** Exactly the regex class `\s` (NOT Character.isWhitespace, whose
    * Unicode extras would split differently from the `split(trim(s),
    * "\\s+")` definition every other text op and the oracle use). */
  @inline private def isRegexSpace(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  /** Whole-doc segmentation: [cost_micro, n_pieces, n_words] over the
    * lowercased whitespace words of `text` (blank/empty → zeros). Words
    * are maximal runs of non-`\s` chars — identical to the registry-wide
    * `filter(split(trim(lower(text)), "\\s+"), length > 0)` definition.
    * Lowercasing is the SIMPLE per-code-point mapping
    * ([[NgramLangId.simpleLower]] — what DuckDB's `lower()` does): Java's
    * full-mapping `toLowerCase` would grow 'İ' into two chars and shift
    * every DP index vs the oracle. Words are CAPPED at
    * [[Unigram.MaxWordChars]] chars before the DP (identically in the HOF
    * twin and the oracle) so the packed `cost·2048 + pieces` cell can
    * never overflow its 11 piece bits — a 3 000-char base64 blob scores
    * its first 2 047 chars instead of silently corrupting the cost. */
  def segment(text: String): GenericArrayData = {
    var cost = 0L; var pieces = 0L; var words = 0L
    val t = NgramLangId.simpleLower(text)
    var start = 0
    val len = t.length
    while (start < len) {
      var end = start
      while (end < len && !isRegexSpace(t.charAt(end))) end += 1
      if (end > start) {
        val capped = math.min(end, start + Unigram.MaxWordChars)
        val packed = wordPacked(t.substring(start, capped))
        cost += packed >> 11
        pieces += packed & (Unigram.Pack - 1)
        words += 1
      }
      start = end + 1
    }
    new GenericArrayData(Array(cost, pieces, words))
  }
}

/**
 * Native unigram-segmentation expression: string → [cost_micro, n_pieces,
 * n_words] (array<long>), whole-stage-codegen'd call into [[UnigramTable]].
 * The vocabulary travels as a plan reference object — O(1) plan size in
 * vocab, real 10⁴-piece vocabularies stay viable (the [[BpeCountExpr]]
 * plumbing).
 */
case class UnigramSegmentExpr(child: Expression, vocab: Seq[(String, Long)],
                              unkCost: Long, maxLen: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unigram_segment requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val table = new UnigramTable(vocab, unkCost, maxLen)

  override def nullSafeEval(input: Any): Any =
    table.segment(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, c => s"$tableRef.segment($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegmentExpr =
    copy(child = newChild)
}
