package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** PDC clinical case assembly (build_pdc_clinical.py:466-620). */
class PdcClinicalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // Two projects: P1's max diagnosis count is 1 (inline shape), P2's is 2
  // (child-table shape). c4 has neither demographic nor diagnosis → excluded.
  private def cases = Seq(
    ("c1", "S1", "P1", "site1", "dt1"),
    ("c2", "S2", "P1", "site2", "dt1"),
    ("c3", "S3", "P2", "site3", "dt2"),
    ("c4", "S4", "P2", "site4", "dt2"))
    .toDF("case_id", "case_submitter_id", "project_submitter_id",
      "primary_site", "disease_type")

  private def demographics = Seq(
    ("c1", "S1", "d1", "female"),
    ("c2", "S2", "d2", "male"),
    ("c2", "S2", "d2z", "unknown"), // duplicate → highest demographic_id wins
    ("c3", "S3", "d3", "female"))
    .toDF("case_id", "case_submitter_id", "demographic_id", "gender")

  private def diagnoses = Seq(
    ("c1", "S1", "pdA"),
    ("c3", "S3", "pdB"),
    ("c3", "S3", "pdC"))
    .toDF("case_id", "case_submitter_id", "primary_diagnosis")

  private def merged = PdcClinical.mergeCaseClinical(
    cases, demographics, diagnoses, Seq("primary_diagnosis"))

  test("demographic 1:1 merge is deterministic; no-clinical-data case excluded") {
    val byCase = merged.select("case_id", "gender")
      .as[(String, Option[String])].collect().toMap
    assert(byCase.keySet === Set("c1", "c2", "c3")) // c4 dropped (py:508-545)
    assert(byCase("c2") === Some("unknown"))        // dup → d2z wins
  }

  test("single-diagnosis project inlines; multi-diagnosis project does not") {
    val rows = merged
      .select("case_id", "diagnosis_count", "project_max_diag", "primary_diagnosis")
      .as[(String, Long, Long, Option[String])].collect().map(r => r._1 -> r).toMap
    assert(rows("c1") === (("c1", 1L, 1L, Some("pdA")))) // P1 max=1 → inline
    assert(rows("c2") === (("c2", 0L, 1L, None)))
    assert(rows("c3") === (("c3", 2L, 2L, None)))        // P2 max=2 → child table
  }

  test("child diagnoses table holds only multi-diagnosis projects' records") {
    val child = PdcClinical.childDiagnoses(merged, diagnoses)
      .select("case_id", "project_submitter_id", "primary_diagnosis")
      .as[(String, String, String)].collect().toSet
    assert(child === Set(("c3", "P2", "pdB"), ("c3", "P2", "pdC")))
  }

  test("webapp view: barcode aliases, dash-form project name, typed null") {
    val v = PdcClinical.webappClinicalView(
      merged.withColumnRenamed("project_submitter_id", "psi")
        .withColumn("project_submitter_id",
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.col("psi"),
            org.apache.spark.sql.functions.lit("_pdc"))))
    val r = v.filter(org.apache.spark.sql.functions.col("case_pdc_id") === "c1")
      .select("case_barcode", "project_short_name", "disease_code")
      .as[(String, String, Option[String])].collect().head
    assert(r === (("S1", "P1-pdc", None)))
  }
}
