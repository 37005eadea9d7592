package graft.clinical

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ClinicalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def cases = Seq((1L, "c1"), (2L, "c2"), (3L, "c3")).toDF("case_id", "case_name")
  private def diags = Seq((1L, "d1"), (1L, "d2"), (2L, "d3")).toDF("case_id", "diag_name")
  private def profile = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("case_id", "grade")

  test("flatten: prefixed single-entry merge + child counts") {
    val out = Clinical.flatten(
      Map("case" -> cases, "profile" -> profile, "diagnoses" -> diags),
      Seq(
        EntitySpec("case", "case_id", columnOrderFirst = Seq("case_id")),
        EntitySpec("profile", "case_id", childOf = Some("case"),
          prefix = Some("prof__"), singleEntry = true),
        EntitySpec("diagnoses", "case_id", childOf = Some("case"))),
      "case")
    assert(out.columns.toSeq === Seq("case_id", "case_name", "prof__grade", "diagnoses__count"))
    val m = out.select("case_id", "diagnoses__count").as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 2L, 2L -> 1L, 3L -> 0L)) // IFNULL(cnt,0) semantics
  }

  test("nest → flattenNested round-trip") {
    val nested = Clinical.nest(cases, diags, "case_id", Seq("diag_name"), "diagnoses")
    val groups = Clinical.flattenNested(nested, "case_id")
    assert(groups.keySet === Set("", "diagnoses"))
    val child = groups("diagnoses").as[(Long, String)].collect().toSet
    assert(child === Set((1L, "d1"), (1L, "d2"), (2L, "d3")))
    // root keeps scalars only
    assert(groups("").columns.toSeq === Seq("case_id", "case_name"))
  }

  test("excluded columns dropped; column order first/last applied") {
    val out = Clinical.flatten(
      Map("case" -> cases.withColumn("junk", lit("x"))),
      Seq(EntitySpec("case", "case_id",
        excludedColumns = Set("junk"),
        columnOrderFirst = Seq("case_name"), columnOrderLast = Seq("case_id"))),
      "case")
    assert(out.columns.toSeq === Seq("case_name", "case_id"))
  }
}
