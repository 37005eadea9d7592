package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Config-driven predicate builder (P7): the reference assembles WHERE
 * clauses from YAML/dict filters — `{key: val}` → equality, `{key: [v…]}` →
 * IN-list, all AND-ed together.
 *
 * Reference: common_etl/support.py:399-431 (`manifest_builder_sql`),
 * :503-539 (`build_manifest_filter`); GDC/build_gdc_data_tables.py:97-121.
 */
object Filters {

  sealed trait Spec
  final case class Eq(value: Any) extends Spec
  final case class In(values: Seq[Any]) extends Spec
  final case class Like(pattern: String) extends Spec
  final case class NotLike(pattern: String) extends Spec

  /** Conjunction of per-column predicates; empty config → TRUE. */
  def configFilter(config: Seq[(String, Spec)]): Column =
    config.foldLeft(lit(true)) { case (acc, (name, spec)) =>
      val c = col(name)
      val p = spec match {
        case Eq(v)       => c === lit(v)
        case In(vs)      => c.isin(vs: _*)
        case Like(s)     => c.like(s)
        case NotLike(s)  => !c.like(s)
      }
      acc && p
    }
}
