package graft.publish

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Row-level security + erasure cascade unit coverage (the registered
  * c31/c32 rows carry the DuckDB oracles; these pin the edge semantics). */
class GovernanceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("policyAudit: per-role counts, mass, entities; admin sees all") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 0L))
      .toDF("k", "seg", "v")
    val out = RowPolicy.policyAudit(df, Seq(
        RowPolicy.Policy("seg_a", col("seg") === "a"),
        RowPolicy.Policy("none", lit(false)),
        RowPolicy.Policy("admin", lit(true))),
      measureCol = col("v"), entityCol = col("seg"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("seg_a") === (2L, 4L, 5000L, 30L, 1L))
    assert(out("none") === (0L, 4L, 0L, 0L, 0L))
    assert(out("admin") === (4L, 4L, 10000L, 60L, 3L))
  }

  test("policyAudit on an empty release candidate: zero rows visible, no ANSI divide-by-zero") {
    val df = Seq.empty[(Long, String, Long)].toDF("k", "seg", "v")
    val out = RowPolicy.policyAudit(df,
        Seq(RowPolicy.Policy("admin", lit(true))), col("v"), col("seg"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === (0L, 0L, 0L))
  }

  test("policyAudit rejects duplicate roles") {
    val df = Seq((1L, "a")).toDF("k", "seg")
    intercept[IllegalArgumentException] {
      RowPolicy.policyAudit(df, Seq(
        RowPolicy.Policy("r", lit(true)), RowPolicy.Policy("r", lit(false))),
        col("k"), col("seg"))
    }
  }

  test("cascadePlan: 2-hop propagation reaches grandchildren, checksum mods") {
    val cust = Seq(1L, 2L, 3L).toDF("ck")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("ok", "ock")
    val items = Seq((100L, 10L), (101L, 11L), (102L, 12L), (103L, 12L))
      .toDF("ik", "iok")
    val req = Seq(1L).toDF("ck")
    val out = Erasure.cascadePlan("cust", cust, col("ck"), req, Seq(
        Erasure.Level("orders", orders, parentRef = col("ock"), ownKey = col("ok")),
        Erasure.Level("items", items, parentRef = col("iok"), ownKey = col("ik"))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("cust") === (1L, 2L, 1L))        // cust 1 deleted
    assert(out("orders") === (2L, 1L, 21L))     // orders 10+11
    assert(out("items") === (2L, 2L, 201L))     // items 100+101 via orders
  }

  test("cascadePlan: empty request set deletes nothing anywhere") {
    val cust = Seq(1L, 2L).toDF("ck")
    val orders = Seq((10L, 1L)).toDF("ok", "ock")
    val req = spark.emptyDataset[Long].toDF("ck")
    val out = Erasure.cascadePlan("cust", cust, col("ck"), req, Seq(
        Erasure.Level("orders", orders, col("ock"), col("ok"))))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("cust") === (0L, 2L) && out("orders") === (0L, 1L))
  }
}
