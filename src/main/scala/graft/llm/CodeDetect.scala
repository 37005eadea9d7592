package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Code-vs-prose detection — the source-mix classifier a training-data
 * pipeline runs before deciding per-domain sampling weights (code and
 * prose want different dedup thresholds, quality gates and mixture
 * temperatures; a crawl shard that is 40% unmarked code silently skews
 * every one of them if it is treated as prose).
 *
 * Signals are deliberately cheap, exact and language-agnostic (the
 * Gopher-rules idiom, not a learned model — [[QualityClassifier]] is the
 * learned path):
 *  - `n_sym`: count of code-syntax characters `; { } ( ) = [ ] < > : #`
 *  - `n_kw`:  word-boundary hits of a fixed keyword set
 *    (def/return/if/else/for/while/class/import/var/const)
 *  - `sym_micro`: n_sym / n_chars in exact integer micro-units
 *    (⌊n_sym·10⁶ / n_chars⌋; n_chars ≤ 2⁴³ before the multiply can
 *    overflow int64 — ANSI throws, never wraps)
 *  - `is_code`: sym_micro ≥ 20 000 (2% syntax chars) OR n_kw ≥ 2
 *
 * Everything is expression-only (one whole-stage-codegen span, zero
 * shuffles, no UDF): at 100 TB this runs at scan speed next to the other
 * per-doc quality columns.
 */
object CodeDetect {

  /** Code-syntax characters, as a regex character class. */
  private val SymClass = """[;{}()=\[\]<>:#]"""

  /** Keyword alternation — word-boundary anchored on both sides. */
  private val KwRegex =
    """\b(def|return|if|else|for|while|class|import|var|const)\b"""

  val SymMicroThreshold = 20000L
  val KwThreshold = 2L

  /** Count of code-syntax chars (0 for empty/NULL-free input). */
  def symbolCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, SymClass, ""))).cast("long")

  /** Count of keyword hits. */
  def keywordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(KwRegex), lit(1))).cast("long")

  /**
   * Per-document signal table: (id, n_chars, n_sym, n_kw, sym_micro,
   * is_code). NULL text rows are dropped (a quality pass has already
   * quarantined them upstream).
   */
  def signals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.filter(t.isNotNull)
      .select(
        col(idCol),
        length(t).cast("long").as("n_chars"),
        symbolCount(t).as("n_sym"),
        keywordCount(t).as("n_kw"))
      .withColumn("sym_micro",
        when(col("n_chars") === 0L, 0L)
          .otherwise(expr("n_sym * 1000000L div n_chars")))
      .withColumn("is_code",
        col("sym_micro") >= SymMicroThreshold || col("n_kw") >= KwThreshold)
  }
}
