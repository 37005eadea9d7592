package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** DCF manifest URL splitter (build_dcf_manifest_bq_tables.py:42-140). */
class DcfManifestSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def row(id: String, acl: String, indexd: String) = (id, acl, indexd)

  private def split(rows: (String, String, String)*) =
    DcfManifest.splitManifestUrls(
        rows.toDF("id", "acl", "indexd_url"))
      .as[(String, Option[String], Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("list literal routes by scheme; web not ACL-gated; gs/s3 open-only") {
    val m = split(
      row("a", "open", "['https://api/x', 'gs://bkt/x', 's3://bkt/x']"),
      row("b", "controlled", "['https://api/y', 'gs://bkt/y', 's3://bkt/y']"),
      row("c", "open,phs000178", "['gs://bkt/z']"))
    assert(m("a") === ((Some("gs://bkt/x"), Some("s3://bkt/x"), Some("https://api/x"))))
    // non-open ACL: web survives, gs/s3 suppressed (py:85-100)
    assert(m("b") === ((None, None, Some("https://api/y"))))
    // phs accession in acl means controlled-access study
    assert(m("c") === ((None, None, None)))
  }

  test("controlled bucket skipped even for open files; bare url = 1-elem list") {
    val m = split(
      row("a", "open", "['gs://gdc-controlled-xyz/x', 's3://ok-bucket/x']"),
      row("b", "open", "gs://plain-bucket/solo"))
    assert(m("a") === ((None, Some("s3://ok-bucket/x"), None)))
    assert(m("b") === ((Some("gs://plain-bucket/solo"), None, None)))
  }

  test("later url overwrites earlier (dict last-wins); empty entries skipped") {
    val m = split(
      row("a", "open", "['gs://bkt/v1', '', 'gs://bkt/v2']"))
    assert(m("a") === ((Some("gs://bkt/v2"), None, None)))
  }

  test("publish include-list suppresses whole columns") {
    val out = DcfManifest.splitManifestUrls(
        Seq(row("a", "open", "['https://api/x', 'gs://bkt/x']")).toDF("id", "acl", "indexd_url"),
        publishUrls = Set("gcs"))
      .as[(String, Option[String], Option[String], Option[String])].collect().head
    assert(out === (("a", Some("gs://bkt/x"), None, None)))
  }

  test("combined map unions legacy+active; paths view projects open gcs path") {
    val legacy = Seq(row("l1", "open", "['gs://bkt/l1']")).toDF("id", "acl", "indexd_url")
    val active = Seq(row("a1", "open", "['gs://bkt/a1']")).toDF("id", "acl", "indexd_url")
    val combined = DcfManifest.combinedFileMap(legacy, active)
    assert(combined.columns.toSeq ===
      Seq("file_gdc_id", "file_gdc_url", "file_gdc_url_aws", "file_gdc_url_web"))
    val paths = DcfManifest.pathsView(combined)
      .as[(String, String)].collect().toSet
    assert(paths === Set("l1" -> "gs://bkt/l1", "a1" -> "gs://bkt/a1"))
  }
}
