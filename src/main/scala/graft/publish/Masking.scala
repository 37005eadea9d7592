package graft.publish

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Policy-driven column masking for publication — the engine-side form of
 * BigQuery's column-level masking / authorized-view pattern the reference
 * relies on the warehouse for (its publish step copies tables verbatim;
 * masking happens in view ACLs). Expressed here as a deterministic
 * projection so a masked RELEASE table can be written once and diffed
 * release-over-release like any other table (c3/c4), instead of living
 * only as an access-time view.
 *
 * Modes (all null-preserving, all exactly replayable in any SQL engine):
 *  - [[MaskMode.Redact]]      — value → typed NULL (column kept for schema
 *                               stability; the BigQuery ALWAYS-NULL policy)
 *  - [[MaskMode.Hash]]        — salted SHA-256, first 16 hex chars: a
 *                               STABLE PSEUDONYM — equal values map equal,
 *                               so masked releases still join/group on the
 *                               column (the k-anon companion, see
 *                               ops/Anonymity); unsalted hashing of a
 *                               low-entropy column is a rainbow lookup,
 *                               hence the mandatory salt
 *  - [[MaskMode.Last4]]       — '*'-pad all but the last 4 chars (shorter
 *                               values mask whole): the account-number
 *                               display form
 *  - [[MaskMode.Bucket]]      — numeric generalization: floor to a bucket
 *                               of `width` via v − pmod(v, width), exact
 *                               floor on NEGATIVES too (pmod ≥ 0 on both
 *                               engines, unlike `%`)
 *
 * Expression-only: the masked projection rides the scan, zero shuffles at
 * any scale.
 */
object Masking {

  sealed trait MaskMode
  object MaskMode {
    case object Redact extends MaskMode
    final case class Hash(salt: String) extends MaskMode {
      require(salt.nonEmpty, "Hash masking requires a non-empty salt")
    }
    case object Last4 extends MaskMode
    final case class Bucket(width: Long) extends MaskMode {
      require(width > 0, s"Bucket width must be positive, got $width")
    }
  }
  import MaskMode._

  /** The masking expression for one TOP-LEVEL column (null-preserving by
    * construction: every branch is null-in → null-out). */
  private def maskExpr(name: String, mode: MaskMode): Column = {
    val c = col(name)
    val q = s"`$name`"
    mode match {
      case Redact => when(lit(false), c) // typed NULL, keeps the column type
      case Hash(salt) =>
        substring(sha2(concat(lit(salt), c.cast("string")), 256), 1, 16)
      case Last4 =>
        when(length(c) <= 4, expr(s"repeat('*', length($q))"))
          .otherwise(concat(expr(s"repeat('*', length($q) - 4)"),
            substring(c, -4, 4)))
      case Bucket(w) =>
        val v = c.cast("long")
        v - pmod(v, lit(w))
    }
  }

  /**
   * Apply `rules` (column name → mode) in place; unlisted columns pass
   * through untouched. Unknown column names fail fast — a typo'd policy
   * that silently publishes the raw column is the failure mode this
   * operator exists to prevent.
   */
  def applyMasks(df: DataFrame, rules: Seq[(String, MaskMode)]): DataFrame = {
    val missing = rules.map(_._1).filterNot(df.columns.contains)
    require(missing.isEmpty, s"mask rules reference unknown columns: $missing")
    val byCol = rules.toMap
    df.select(df.columns.toIndexedSeq.map { name =>
      byCol.get(name) match {
        case Some(m) => maskExpr(name, m).as(name)
        case None    => col(name)
      }
    }: _*)
  }
}
