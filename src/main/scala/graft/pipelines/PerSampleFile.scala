package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The GDC per-sample-file build — the reference's flagship query shape and
 * SURVEY §7's minimum end-to-end slice
 * (BQ_Table_Building/CDA/GDC/create_tables_per_sample_file_gdc.py:86-206):
 *
 *  - split the file-metadata CTE into fm1 (single-entity files) and fm2
 *    (multi-entity files, detected via the concat guard `NOT LIKE '%;%'`);
 *  - join the aliquot branch to `aliquot_to_case`, the slide branch to
 *    `slide_to_case` (compound keys), the case branch with
 *    `CAST(NULL AS STRING)` placeholders for the sample columns;
 *  - UNION ALL the branches; extract the barcode suffix with
 *    `REGEXP_EXTRACT(entity_submitter_id, r'^[^-]*-(.*)$')`
 *    (per_sample_file_gdc.py:51).
 *
 * Inputs follow the FIXTURES.md §A2 schemas. Scale: each branch is one
 * equi-join (entity dimension broadcast when small); the union is free;
 * no driver materialization.
 */
object PerSampleFile {

  /** `REGEXP_EXTRACT(x, r'^[^-]*-(.*)$')` — barcode suffix after the first
    * hyphen (per_sample_file_gdc.py:51). */
  def barcodeSuffix(c: Column): Column = regexp_extract(c, "^[^-]*-(.*)$", 1)

  /**
   * @param file        file(file_id, file_name, access)
   * @param fawe        file_associated_with_entity(file_id, entity_id,
   *                    entity_submitter_id, entity_type)
   * @param aliquotToCase aliquot_to_case(aliquot_gdc_id, case_barcode,
   *                    sample_barcode, sample_type_name)
   * @param slideToCase slide_to_case(slide_gdc_id, case_barcode,
   *                    sample_barcode, sample_type_name)
   */
  // No broadcast() hints on the entity maps: their size is data-dependent
  // (the reference's are ~10^4 rows and auto-broadcast under the 10 MB
  // threshold), and a hard-coded hint forces a single-threaded driver-side
  // HashedRelation build even when the map is fact-sized — the c11 lesson
  // (measured: ~30 s of pure driver wall at sf1). Below the threshold the
  // planner still broadcasts; above it, AQE picks the shuffle join.
  def build(file: DataFrame, fawe: DataFrame,
            aliquotToCase: DataFrame, slideToCase: DataFrame): DataFrame = {
    val fm = file.join(fawe, Seq("file_id"))

    // fm1/fm2 split: multi-entity files carry ';'-concatenated ids
    // (per_sample_file_gdc.py:73-76, 111-116)
    val fm1 = fm.filter(!col("entity_id").like("%;%"))
    val fm2 = fm.filter(col("entity_id").like("%;%"))
      .withColumn("entity_id", lit("multi"))

    val aliquotBranch = fm1.filter(col("entity_type") === "aliquot")
      .join(aliquotToCase, col("entity_id") === col("aliquot_gdc_id"))
      .select(col("file_id"), col("file_name"), col("access"),
        lit("aliquot").as("entity_kind"),
        col("case_barcode"), col("sample_barcode"), col("sample_type_name"),
        barcodeSuffix(col("entity_submitter_id")).as("entity_suffix"))

    val slideBranch = fm1.filter(col("entity_type") === "slide")
      .join(slideToCase, col("entity_id") === col("slide_gdc_id"))
      .select(col("file_id"), col("file_name"), col("access"),
        lit("slide").as("entity_kind"),
        col("case_barcode"), col("sample_barcode"), col("sample_type_name"),
        barcodeSuffix(col("entity_submitter_id")).as("entity_suffix"))

    // case branch: no sample columns → CAST(NULL AS STRING) placeholders
    // (per_sample_file_gdc.py:60-62, 184-186)
    val caseBranch = fm1.filter(col("entity_type") === "case")
      .unionByName(fm2)
      .select(col("file_id"), col("file_name"), col("access"),
        lit("case").as("entity_kind"),
        barcodeSuffix(col("entity_submitter_id")).as("case_barcode"),
        lit(null).cast("string").as("sample_barcode"),
        lit(null).cast("string").as("sample_type_name"),
        barcodeSuffix(col("entity_submitter_id")).as("entity_suffix"))

    aliquotBranch.unionByName(slideBranch).unionByName(caseBranch)
  }

  /**
   * DRS/index-file URI enrichment (per_sample_file_gdc.py:267-302): LEFT
   * join the built table to the `drs_uri(file_uuid, gcs_path)` table so
   * files without an index URI keep NULL paths.
   */
  def withDrsUris(built: DataFrame, drsUri: DataFrame): DataFrame =
    built.join(drsUri, built("file_id") === drsUri("file_uuid"), "left")
      .drop("file_uuid")
}
