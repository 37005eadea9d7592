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

  /**
   * t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
   * third rung of the anonymity ladder: l-diversity can hold while a
   * class's sensitive DISTRIBUTION still leaks (e.g. all-low salaries),
   * so each class's distribution must stay within EMD t of the global
   * one. For an ORDERED sensitive attribute the EMD has the closed form
   * (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)| over the m ordered buckets — and
   * with integer bucket counts it is EXACT: the cumulative numerator over
   * the common denominator n_class·n_total is pure int64, and the audit
   * emits floor(10⁶·Σ|cum|/((m−1)·n_class·n_total)). (Int64 headroom:
   * Σ|cum| ≤ (m−1)·n_class·n_total ≤ (m−1)·n², so ×10⁶ fits until
   * n ≈ 10⁵·√m rows — beyond that, widen to DECIMAL(38,0).)
   *
   * `bucketCol` must be an integer ORDERED bucket expression that is
   * bit-portable across engines (integer arithmetic, or floor over IEEE
   * +,−,×,÷ which are correctly-rounded everywhere — never libm).
   *
   * Scale shape: two corpus hash-aggs (per-class-bucket, per-bucket); the
   * bucket histogram (bounded by the bucket DOMAIN) collects and ships as
   * a literal array, so the per-class grid is an explode + map lookup —
   * no join, no cartesian — and the cum window runs over classes × m
   * tiny rows. Eager: the m-row histogram collects at construction.
   */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
                      bucketCol: org.apache.spark.sql.Column,
                      tMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL contract: a NULL bucket (NULL sensitive attribute) has no
    // position in the ordered domain, so those rows are excluded from
    // BOTH the global histogram and the per-class distributions (they
    // previously NPE'd the histogram collect at construction)
    val base = df.select(quasiCols.map(col) :+
      bucketCol.cast("long").as("_b"): _*)
      .filter(col("_b").isNotNull)
    // the global bucket histogram is BOUNDED by the bucket domain (m
    // buckets, not m rows) — collect it (the l16 bounded-collect
    // precedent) and ship it as a literal array, so the per-class grid
    // is an explode + map lookup: NO join, NO cartesian anywhere
    val gbRows = base.groupBy(col("_b"))
      .agg(count(lit(1)).cast("long").as("_g"))
      .orderBy(col("_b")).collect()
    val m = gbRows.length.toLong
    val nTotal = gbRows.map(_.getLong(1)).sum
    val gLit = array(gbRows.map(r =>
      struct(lit(r.getLong(0)).as("b"), lit(r.getLong(1)).as("g"))): _*)
    val perClass = base
      .groupBy(quasiCols.map(col) :+ col("_b"): _*)
      .agg(count(lit(1)).cast("long").as("_c"))
      .groupBy(quasiCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("_b"), col("_c")))).as("_cm"),
        sum(col("_c")).cast("long").as("class_n"))
    val wCum = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("_gb.b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = perClass
      .select(quasiCols.map(col) ++ Seq(col("class_n"),
        explode(gLit).as("_gb"), col("_cm")): _*)
      .withColumn("_c", coalesce(element_at(col("_cm"), col("_gb.b")), lit(0L)))
      .withColumn("_cum",
        sum(col("_c") * lit(nTotal) - col("_gb.g") * col("class_n")).over(wCum))
    grid.groupBy(quasiCols.map(col): _*)
      .agg(max(col("class_n")).as("class_n"),
        count(lit(1)).cast("long").as("m_buckets"),
        sum(abs(col("_cum"))).as("_sumabs"))
      .select(quasiCols.map(col) ++ Seq(
        col("class_n"), col("m_buckets"),
        (when(lit(m) <= 1, lit(0L)).otherwise(
          expr(s"_sumabs * 1000000L div ((m_buckets - 1) * class_n * ${nTotal}L)")))
          .as("emd_micro")): _*)
      .withColumn("violates_t", col("emd_micro") > tMicro)
  }

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
