package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Golden-diff harness: the reference's own regression-test primitives
 * (BQ_Table_Building/CDA/tests/shared_test_functions.py) as engine ops —
 * row counts (:78-116), key coverage (:33-75), per-column EXCEPT diffs
 * (:119-192), order-insensitive concat compare (:195-335).
 */
class DiffSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def old3 = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", Double.NaN))
    .toDF("id", "s", "x")
  private def new3 = Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", Double.NaN))
    .toDF("id", "s", "x")

  test("symmetric diff tags sides; identical tables match") {
    val d = Diff.symmetricDiff(old3, new3).collect()
    assert(d.length === 4) // ids 2,3 old-side; 2,4 new-side
    assert(Diff.tablesMatch(old3, old3))
    assert(!Diff.tablesMatch(old3, new3))
  }

  test("NaN-safe mode matches its own NaN rows (lookup.py:677-690)") {
    val a = Seq((1L, Double.NaN)).toDF("id", "x")
    assert(Diff.symmetricDiff(a, a, nanSafeCols = Seq("x")).isEmpty)
    assert(Diff.nanSafeString(lit(Double.NaN)) != null)
  }

  test("added/removed/changed keys (compare_and_publish_tables.py:127-136, 306-331)") {
    assert(Diff.addedRows(old3, new3, Seq("id")).select("id").as[Long].collect().toSet === Set(4L))
    assert(Diff.removedRows(old3, new3, Seq("id")).select("id").as[Long].collect().toSet === Set(3L))
    assert(Diff.changedKeys(old3, new3, Seq("id")).as[Long].collect().toSet === Set(2L))
  }

  test("duplicate keys (HAVING COUNT>1)") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("id", "v")
    assert(Diff.duplicateKeys(df, Seq("id")).select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("order-insensitive concat compare (shared_test_functions.py:195-335)") {
    val a = Seq((1L, "x;y;z"), (2L, "a;b"), (3L, "q")).toDF("id", "vals")
    val b = Seq((1L, "z;x;y"), (2L, "a;c"), (3L, "q")).toDF("id", "vals")
    val diff = Diff.concatColumnDiff(a, b, Seq("id"), "vals")
    // id 1 is the same set in different order → NOT a diff; id 2 differs
    assert(diff.select("id").as[Long].collect().toSet === Set(2L))
  }

  test("schemaDiff: added/removed/type_changed/unchanged, identical schemas all-unchanged") {
    import org.apache.spark.sql.functions._
    val base = Seq((1L, "a", 1.5)).toDF("k", "s", "p")
    val next = base.drop("s")
      .withColumn("p", col("p").cast("decimal(10,2)"))
      .withColumn("extra", lit(7))
    val out = Diff.schemaDiff(base, next)
      .as[(String, String, Option[String], Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("k") === (("k", "unchanged", Some("bigint"), Some("bigint"))))
    assert(out("s") === (("s", "removed", Some("string"), None)))
    assert(out("p") === (("p", "type_changed", Some("double"), Some("decimal(10,2)"))))
    assert(out("extra") === (("extra", "added", None, Some("int"))))
    // identical schemas: every row unchanged, plan is metadata-only
    val same = Diff.schemaDiff(base, base)
    assert(same.filter(col("status") =!= "unchanged").count() === 0L)
    assert(same.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }
}
