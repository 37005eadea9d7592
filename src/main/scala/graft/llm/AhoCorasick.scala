package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Aho–Corasick multi-pattern matching (Aho & Corasick 1975) — the
 * blocklist/safety-screen primitive of a curation pipeline (banned terms,
 * refusal-phrase screens, contamination canary strings). The reference
 * applies lists of keyword predicates as stacked LIKE filters (e.g. the
 * config-driven filter builders behind its table queries); at 100 TB a
 * P-term blocklist as P `LIKE '%term%'` passes scans the corpus P times —
 * the automaton matches ALL patterns in ONE left-to-right pass per
 * document, O(bytes + hits) regardless of P.
 *
 * Matching is BYTE-wise over UTF-8 (multi-byte patterns just work) and
 * counts EVERY occurrence end position — nested hits included ("scan"
 * also fires "can"), and self-overlapping hits separately ("aa" hits
 * "aaaa" 3 times, where a replace-based count sees 2). Oracle caveat
 * pinned for l107: DuckDB replays counts with the replace-count formula,
 * which equals the all-occurrence count exactly when no pattern has a
 * proper border (prefix = suffix); the registry's pattern set is
 * border-free and AhoCorasickSpec asserts that property.
 *
 * The automaton is a dense byte-fanout goto table (256 ints per node,
 * nodes ≤ total pattern bytes + 1) — built once on the driver and shipped
 * per executor as a plan REFERENCE object (the BpeTable idiom), never as
 * per-row state or P literals in the expression tree. Dense fan-out is
 * the right trade for blocklists (≤ ~10⁴ nodes ⇒ ≤ ~10 MB); a 10⁵-node
 * dictionary would want a sparse-node variant.
 */
final class AcAutomaton(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "AcAutomaton needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everywhere — refuse")

  // goto table (complete after BFS: every (node, byte) resolves), and the
  // merged pattern-id output list per node
  private val (gotoTab: Array[Array[Int]], outTab: Array[Array[Int]]) = {
    val pats = patterns.map(_.getBytes("UTF-8"))
    val next = mutable.ArrayBuffer(Array.fill(256)(-1))
    val out = mutable.ArrayBuffer(List.empty[Int])
    for ((p, pid) <- pats.zipWithIndex) {
      var node = 0
      for (b <- p) {
        val c = b & 0xff
        if (next(node)(c) == -1) {
          next += Array.fill(256)(-1); out += Nil
          next(node)(c) = next.length - 1
        }
        node = next(node)(c)
      }
      out(node) = pid :: out(node)
    }
    val fail = Array.fill(next.length)(0)
    val q = mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val v = next(0)(c)
      if (v == -1) next(0)(c) = 0 else { fail(v) = 0; q += v }
      c += 1
    }
    // BFS: fail(u) is strictly shallower than u, so its output list is
    // already suffix-merged when u dequeues
    while (q.nonEmpty) {
      val u = q.dequeue()
      out(u) = out(u) ::: out(fail(u))
      var b = 0
      while (b < 256) {
        val v = next(u)(b)
        if (v == -1) next(u)(b) = next(fail(u))(b)
        else { fail(v) = next(fail(u))(b); q += v }
        b += 1
      }
    }
    (next.toArray, out.map(_.toArray).toArray)
  }

  /** Per-pattern occurrence counts (all end positions) in one pass. */
  def countHits(s: UTF8String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    val bytes = s.getBytes
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = gotoTab(node)(bytes(i) & 0xff)
      val o = outTab(node)
      var k = 0
      while (k < o.length) { counts(o(k)) += 1L; k += 1 }
      i += 1
    }
    counts
  }

  /** Early-exit screen: does ANY pattern occur? Stops at the first hit. */
  def anyHit(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = gotoTab(node)(bytes(i) & 0xff)
      if (outTab(node).length > 0) return true
      i += 1
    }
    false
  }

  def wrapCounts(s: UTF8String): GenericArrayData = new GenericArrayData(countHits(s))
}

object AcAutomaton {
  /** True iff `p` has a proper border (a strict prefix that is also a
    * suffix) — exactly the patterns whose self-overlapping occurrences
    * make the replace-count oracle formula undercount. */
  def hasProperBorder(p: String): Boolean = {
    val b = p.getBytes("UTF-8")
    (1 until b.length).exists(k =>
      (0 until k).forall(i => b(i) == b(b.length - k + i)))
  }
}

/** Per-pattern all-occurrence counts as `array<bigint>` (index = pattern
  * position in `patterns`). One automaton pass per row, codegen'd; the
  * automaton rides the plan as a reference object. */
case class AcCountsExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ac_counts requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ac_counts"

  @transient private lazy val automaton = new AcAutomaton(patterns)

  override def nullSafeEval(input: Any): Any =
    automaton.wrapCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", automaton, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ref.wrapCounts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcCountsExpr =
    copy(child = newChild)
}

object AhoCorasick {

  /** Register `graft_ac_counts(string)` bound to `patterns`. Re-registering
    * with a different list rebinds the name (session-scoped). */
  def register(spark: SparkSession, patterns: Seq[String]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ac_counts",
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_ac_counts(text) takes exactly 1 argument, got ${children.length}")
        AcCountsExpr(children.head, patterns)
      },
      "scala_udf")

  private def countsCol(spark: SparkSession, text: Column, patterns: Seq[String]): Column = {
    register(spark, patterns)
    call_function("graft_ac_counts", text)
  }

  /**
   * Long-form blocklist report: one row per (id, pattern) with the
   * pattern's all-occurrence count, hits only. One corpus scan, one
   * automaton pass per document, then a posexplode of the fixed-length
   * counts array — no per-pattern scan, no shuffle.
   */
  def blocklistHits(spark: SparkSession, df: DataFrame, idCol: String,
                    textCol: String, patterns: Seq[String]): DataFrame = {
    val names = typedlit(patterns)
    df.select(col(idCol),
        posexplode(countsCol(spark, col(textCol), patterns)).as(Seq("idx", "n_hits")))
      .filter(col("n_hits") > 0)
      .select(col(idCol), element_at(names, col("idx") + 1).as("pattern"), col("n_hits"))
  }
}
