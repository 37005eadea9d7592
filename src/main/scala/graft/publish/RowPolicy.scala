package graft.publish

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Row-level security (round 13) — the row-wise complement to
 * [[Masking]]'s column policies: each ROLE sees the subset of rows its
 * predicate admits (the warehouse row-access-policy primitive; the
 * reference's program-scoped datasets express the same contract one
 * dataset per program).
 *
 * Two entry points:
 *  - [[applyPolicy]] builds the role's view — just a filter, so every
 *    downstream optimization (pushdown, pruning) applies untouched;
 *  - [[policyAudit]] is the pre-publish LEAK AUDIT: per role, how many
 *    rows are visible, how much of the sensitive mass (a caller-chosen
 *    measure column) they can see, and over how many distinct entities
 *    — evaluated for ALL roles in ONE corpus scan (each role is one
 *    conditional aggregate, the Expectations.gate shape; adding a role
 *    adds an expression, not a job).
 *
 * Output of the audit: (role, visible_rows, total_rows, visible_bp,
 * measure_sum, n_entities) — visible_bp = ⌊10⁴·visible/total⌋.
 */
object RowPolicy {

  final case class Policy(role: String, predicate: Column)

  def applyPolicy(df: DataFrame, p: Policy): DataFrame = df.filter(p.predicate)

  def policyAudit(df: DataFrame, policies: Seq[Policy],
                  measureCol: Column, entityCol: Column): DataFrame = {
    require(policies.nonEmpty, "no policies given")
    require(policies.map(_.role).distinct.size == policies.size,
      "duplicate role names")
    val aggs = policies.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        sum(when(p.predicate, 1L).otherwise(0L)).as(s"_v$i"),
        sum(when(p.predicate, measureCol.cast("long")).otherwise(0L))
          .as(s"_m$i"),
        // distinct entities the role can see; count_distinct of a
        // conditional null — nulls don't count
        countDistinct(when(p.predicate, entityCol)).as(s"_e$i"))
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = policies.zipWithIndex.map { case (p, i) =>
      struct(lit(p.role).as("role"),
        coalesce(col(s"_v$i"), lit(0L)).as("v"),
        coalesce(col(s"_m$i"), lit(0L)).as("m"),
        coalesce(col(s"_e$i"), lit(0L)).as("e"))
    }
    one.select(explode(array(rows: _*)).as("_r"), col("_n"))
      .select(col("_r.role").as("role"),
        col("_r.v").cast("long").as("visible_rows"),
        col("_n").cast("long").as("total_rows"),
        // guard _n = 0: an empty release candidate audits cleanly
        // instead of throwing DIVIDE_BY_ZERO under ANSI mode
        when(col("_n") > 0, expr("(10000 * _r.v) div _n"))
          .otherwise(lit(0L)).as("visible_bp"),
        col("_r.m").cast("long").as("measure_sum"),
        col("_r.e").cast("long").as("n_entities"))
  }
}
