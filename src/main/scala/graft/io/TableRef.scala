package graft.io

import graft.normalize.Normalize

/**
 * Versioned, lifecycle-staged table naming (SURVEY §1.1-1): the reference
 * addresses every table as `project.dataset.table` with names synthesized
 * from (stage, base name, release) and sanitized to `[A-Za-z0-9_]`.
 *
 * Reference: cda_bq_etl/utils.py:271-370 (per-stage id builders),
 * :158-202 (`sanitize_file_prefix`, `construct_table_name`).
 */
final case class TableRef(stage: TableRef.Stage, name: String, release: String) {

  /** `{release}_{name}` for dev/raw, `{name}_{release}` for published
    * stages (utils.py:271-289 vs :306-370). */
  def tableName: String = {
    val n = Normalize.sanitizeFilePrefix(name)
    val r = Normalize.sanitizeFilePrefix(release)
    stage match {
      case TableRef.Dev => s"${r}_$n"
      case _            => s"${n}_$r"
    }
  }

  /** Catalog identifier `<database>.<table>`. */
  def id(database: String): String = s"$database.$tableName"

  /** The `_current` alias used by the publish workflow. */
  def currentName: String = s"${Normalize.sanitizeFilePrefix(name)}_current"
}

object TableRef {
  sealed trait Stage
  case object Dev extends Stage        // raw/dev tables (utils.py:271-289)
  case object Metadata extends Stage   // utils.py:306-322
  case object PerSample extends Stage  // utils.py:325-336
  case object Clinical extends Stage   // utils.py:339-350
  case object Quant extends Stage      // utils.py:353-370
  case object Excluded extends Stage   // utils.py:292-303

  /**
   * GDC release arithmetic (lookup.py:212-233): releases are `r<NN>` with
   * optional `p<M>` patch; the previous release of `r30` is `r29`… down to
   * the oldest supported `r30`-era floor handled by the caller.
   */
  def previousGdcRelease(release: String): Option[String] = {
    val m = "^r([0-9]+)(p[0-9]+)?$".r
    release match {
      case m(n, _) if n.toInt > 1 => Some(s"r${n.toInt - 1}")
      case _ => None
    }
  }
}
