package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Config-driven data-quality expectation gate — the declarative QC step a
 * pipeline runs before publish (the same role as the reference's
 * per-build QC/diff checks, generalized to a rule table; the rule
 * vocabulary is the public dbt-test / Great-Expectations core set:
 * not_null, unique, accepted_values, range, regex).
 *
 * All rules evaluate in ONE scan: each rule contributes one conditional
 * aggregate to a single hash aggregation (uniqueness rules add a distinct
 * count, which Catalyst plans via expand in the same pass), the 1-row
 * result explodes into one row per rule. No per-rule scans, no driver
 * loops — adding a rule adds an expression, not a job.
 *
 * Null semantics: `not_null` owns null-ness; every other rule evaluates
 * NON-NULL values only (a null price is one violation, not three). This
 * keeps violation counts attributable to exactly one rule.
 *
 * Output: (rule_id, kind, col_name, violations, n, pass) — one row per
 * rule, `n` the table row count, `pass` = violations == 0.
 */
object Expectations {

  sealed trait Expectation {
    def id: String
    def column: String
    def kind: String
    /** Count of violating rows as an aggregate expression. */
    private[ops] def violations: Column
  }

  /** Column must never be NULL. */
  final case class ExpectNotNull(id: String, column: String) extends Expectation {
    val kind = "not_null"
    private[ops] def violations: Column =
      sum(when(col(column).isNull, 1L).otherwise(0L))
  }

  /** Non-null values must be distinct (duplicate count = extra copies). */
  final case class ExpectUnique(id: String, column: String) extends Expectation {
    val kind = "unique"
    private[ops] def violations: Column =
      count(col(column)) - countDistinct(col(column))
  }

  /** Non-null values must lie in [lo, hi] (inclusive, long-castable). */
  final case class ExpectInRange(id: String, column: String,
                                 lo: Long, hi: Long) extends Expectation {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val kind = "in_range"
    private[ops] def violations: Column = {
      val c = col(column).cast("long")
      sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
    }
  }

  /** Non-null values must match the (Java) regex. */
  final case class ExpectMatches(id: String, column: String,
                                 pattern: String) extends Expectation {
    val kind = "matches"
    private[ops] def violations: Column =
      sum(when(col(column).isNotNull && !col(column).rlike(pattern), 1L)
        .otherwise(0L))
  }

  /** Non-null values must come from the accepted set. */
  final case class ExpectInSet(id: String, column: String,
                               values: Seq[String]) extends Expectation {
    require(values.nonEmpty, "accepted set must not be empty")
    val kind = "in_set"
    private[ops] def violations: Column =
      sum(when(col(column).isNotNull && !col(column).isin(values: _*), 1L)
        .otherwise(0L))
  }

  /** One referential-integrity rule: every non-null value of `column`
    * must exist in `parent.parentKey` (the dbt `relationships` test).
    * Key columns must be equality-compatible types. */
  final case class ExpectForeignKey(id: String, column: String,
                                    parent: DataFrame, parentKey: String) {
    val kind = "foreign_key"
  }

  /**
   * Referential-integrity audit — [[gate]]'s cross-table complement,
   * same output schema so suites union. ONE scan of the child table:
   * each rule left-joins its DISTINCT parent key set (skinny —
   * broadcastable at any realistic dimension count) and contributes one
   * conditional aggregate to a single hash-agg; a child row violates
   * rule r iff its key is NON-NULL and unmatched (null ownership stays
   * with not_null, exactly as in [[gate]]).
   */
  def refGate(df: DataFrame, rules: Seq[ExpectForeignKey]): DataFrame = {
    require(rules.nonEmpty, "no foreign-key rules given")
    require(rules.map(_.id).distinct.size == rules.size, "duplicate rule ids")
    val withMarks = rules.zipWithIndex.foldLeft(df) { case (acc, (r, i)) =>
      val p = broadcast(r.parent.select(col(r.parentKey).as(s"_pk$i")).distinct())
      acc.join(p, col(r.column) === col(s"_pk$i"), "left")
    }
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(col(r.column).isNotNull && col(s"_pk$i").isNull, 1L)
        .otherwise(0L)).as(s"_v$i")
    } :+ count(lit(1)).as("_n")
    val one = withMarks.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.id).as("rule_id"), lit(r.kind).as("kind"),
        lit(r.column).as("col_name"),
        coalesce(col(s"_v$i"), lit(0L)).as("violations"))
    }
    one.select(explode(array(rows: _*)).as("_r"), col("_n"))
      .select(col("_r.rule_id").as("rule_id"), col("_r.kind").as("kind"),
        col("_r.col_name").as("col_name"),
        col("_r.violations").as("violations"),
        col("_n").cast("long").as("n"),
        (col("_r.violations") === 0L).as("pass"))
  }

  def gate(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.id).distinct.size == rules.size, "duplicate rule ids")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(r.violations.cast("long"), lit(0L)).as(s"_v$i")
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.id).as("rule_id"), lit(r.kind).as("kind"),
        lit(r.column).as("col_name"), col(s"_v$i").as("violations"))
    }
    one.select(explode(array(rows: _*)).as("_r"), col("_n"))
      .select(col("_r.rule_id").as("rule_id"), col("_r.kind").as("kind"),
        col("_r.col_name").as("col_name"),
        col("_r.violations").as("violations"),
        col("_n").cast("long").as("n"),
        (col("_r.violations") === 0L).as("pass"))
  }
}
