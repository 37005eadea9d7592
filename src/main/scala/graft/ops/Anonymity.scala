package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et al.
 * 2007) — the data-governance gate next to PII scrubbing (l26): before a
 * table leaves the curation pipeline, every quasi-identifier combination
 * must cover at least k individuals, and (l-diversity) the sensitive
 * attribute within each combination must take at least l distinct values,
 * or the group is re-identifiable / attribute-disclosing.
 *
 * Output: one row per quasi-identifier equivalence class with its size,
 * sensitive-value diversity, and the two flags — the audit table a release
 * gate aggregates ("0 violating classes" is the publish condition) and a
 * suppression step anti-joins against.
 *
 * Scale shape: ONE hash-aggregate on the quasi-identifier key (count +
 * count distinct sensitive); no windows, no joins. 100 TB of rows reduce
 * to one row per equivalence class.
 */
object Anonymity {

  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame =
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("class_n"),
        countDistinct(col(sensitiveCol)).cast("long").as("sensitive_distinct"))
      .select(quasiCols.map(col) ++ Seq(
        col("class_n"), col("sensitive_distinct"),
        (col("class_n") < k).as("violates_k"),
        (col("sensitive_distinct") < l).as("violates_l")): _*)

  /** Suppression pass: drop every row whose quasi-identifier class
    * violates k-anonymity — the minimal-distortion release transform
    * (generalization hierarchies would come before suppression in a full
    * ARX-style pipeline). One agg + one key-partitioned semi join. */
  def suppressViolatingClasses(df: DataFrame, quasiCols: Seq[String],
                               sensitiveCol: String, k: Int): DataFrame = {
    val ok = kAnonymityAudit(df, quasiCols, sensitiveCol, k, l = 1)
      .filter(!col("violates_k"))
      .select(quasiCols.map(col): _*)
    df.join(ok, quasiCols, "left_semi")
  }
}
