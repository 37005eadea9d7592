package graft.clinical

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PDC clinical case assembly — the driver-side dict-merge core of the
 * reference's PDC clinical build, re-expressed as a join DAG
 * (BQ_Table_Building/PDC/build_pdc_clinical.py:466-620).
 *
 * Reference semantics:
 *  - each case carries (case_id, case_submitter_id, project_submitter_id,
 *    primary_site, disease_type); demographic records merge 1:1 onto the
 *    case (py:492-544 `case.update(demographic_record)`); diagnosis
 *    records attach as a list per case;
 *  - a case with NEITHER a diagnosis record NOR a demographic record is
 *    excluded from the clinical table entirely (py:508-545
 *    `cases_with_no_clinical_data` → `exclude_case_id_set`);
 *  - per project, `max_diagnosis_count` = the largest diagnoses-list
 *    length over that project's cases (py:514-517). When it is exactly 1
 *    the single diagnosis inlines into the case row; when >1 the
 *    diagnoses go to a separate `*_clinical_diagnoses_*` child table and
 *    the case row keeps no diagnosis columns (py:561-580).
 *
 * The reference does all of this in Python dicts on the driver; here it is
 * two hash-aggregates + three joins (the per-project max table is tiny and
 * broadcasts), so the same semantics hold with the case table distributed.
 * Demographic 1:1 cardinality: the reference's dict overwrite keeps an
 * arbitrary "last fetched" record when the API yields duplicates; we make
 * the choice deterministic — highest `demographic_id` wins.
 */
object PdcClinical {

  private val CaseKey = Seq("case_id", "case_submitter_id")

  /**
   * Case-level clinical table. `diagFields` are the diagnosis columns to
   * inline when the project's max diagnosis count is 1.
   */
  def mergeCaseClinical(
      cases: DataFrame,
      demographics: DataFrame,
      diagnoses: DataFrame,
      diagFields: Seq[String]): DataFrame = {

    // deterministic 1:1 demographic: highest demographic_id per case wins
    val demoCols = demographics.columns.filterNot(c => CaseKey.contains(c))
    val demo1 = demographics
      .withColumn("__rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(CaseKey.map(col): _*)
          .orderBy(col("demographic_id").desc)))
      .filter(col("__rk") === 1).drop("__rk")

    // per-case diagnosis count + the single diagnosis (for the inline case)
    val diagAgg = diagnoses.groupBy(CaseKey.map(col): _*)
      .agg(
        count(lit(1)).cast("long").as("diagnosis_count"),
        diagFields.map(f => max(col(f)).as(s"__inline_$f")): _*)

    val joined = cases
      .join(demo1, CaseKey, "left")
      .join(diagAgg, CaseKey, "left")
      .withColumn("diagnosis_count", coalesce(col("diagnosis_count"), lit(0L)))

    // exclude cases with no clinical data at all (no demo AND no diagnoses)
    val hasDemo = demoCols.map(c => col(c).isNotNull).reduce(_ || _)
    val withClinical = joined.filter(hasDemo || col("diagnosis_count") > 0)

    // per-project max diagnosis count — tiny table, broadcasts back
    val projMax = withClinical.groupBy("project_submitter_id")
      .agg(max(col("diagnosis_count")).as("project_max_diag"))

    val decided = withClinical.join(broadcast(projMax), Seq("project_submitter_id"))
    val inline = col("project_max_diag") === 1 && col("diagnosis_count") === 1
    val inlined = diagFields.foldLeft(decided) { (df, f) =>
      df.withColumn(f, when(inline, col(s"__inline_$f")))
    }
    inlined.drop(diagFields.map(f => s"__inline_$f"): _*)
  }

  /**
   * Child diagnoses table for projects whose max diagnosis count is > 1:
   * (case_id, case_submitter_id, project_submitter_id) + diagnosis fields
   * (py:573-580). `caseClinical` is `mergeCaseClinical`'s output (supplies
   * the per-project shape decision and the exclusion filter).
   */
  def childDiagnoses(caseClinical: DataFrame, diagnoses: DataFrame): DataFrame = {
    val keys = caseClinical
      .filter(col("project_max_diag") > 1)
      .select((CaseKey :+ "project_submitter_id").map(col): _*)
    diagnoses.join(keys, CaseKey)
  }

  /**
   * The webapp/solr view projection (py:830-845): barcode aliases and the
   * `ARRAY_TO_STRING(SPLIT(project_short_name,'_'),'-')` dash-form, plus a
   * typed NULL disease_code placeholder.
   */
  def webappClinicalView(caseClinical: DataFrame): DataFrame =
    caseClinical.select(
      col("case_id").as("case_pdc_id"),
      col("case_submitter_id").as("case_barcode"),
      regexp_replace(col("project_submitter_id"), "_", "-").as("project_short_name"),
      col("primary_site"),
      col("disease_type"),
      col("gender"),
      lit(null).cast("string").as("disease_code"))
}
