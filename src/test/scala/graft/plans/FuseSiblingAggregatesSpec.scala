package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * [[FuseSiblingAggregates]] — the pre-CBO rule collapsing several
 * aggregations of the same child, joined back onto a base on the same
 * key, into ONE aggregate + ONE join (the reference's driver-merge DAG,
 * create_tables_file_metadata_gdc.py:78-438, re-expressed relationally).
 * The SparkTestBase session installs graft.GraftExtensions, so the rule
 * is active in every plan compiled here.
 */
class FuseSiblingAggregatesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    .toDF("k", "tag")
  private def child = Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 30L, "x"),
    (2L, 40L, "z"), (3L, 50L, "y")).toDF("fk", "v", "s")

  private def nAggs(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.length
  private def nJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.length

  test("two sibling aggregates fuse into one aggregate + one join") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.groupBy(col("fk").as("k2")).agg(count(lit(1)).as("cnt"),
      max("s").as("ms"))
    val q = base.join(a1, col("k") === col("k1"), "left")
      .join(a2, col("k") === col("k2"), "left")
      .select(col("k"), col("tag"), col("sv"), col("cnt"), col("ms"))
    assert(nAggs(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(nJoins(q) == 1)
    val got = q.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(got == Seq(
      (1L, "a", Some(30L), Some(2L), Some("y")),
      (2L, "b", Some(70L), Some(2L), Some("z")),
      (3L, "c", Some(50L), Some(1L), Some("y")),
      (4L, "d", None, None, None)))
  }

  test("three-branch sibling chain fuses to one aggregate") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.groupBy(col("fk").as("k2")).agg(count(lit(1)).as("cnt"))
    val a3 = c.groupBy(col("fk").as("k3")).agg(min("v").as("mv"))
    val q = base.join(a1, col("k") === col("k1"), "left")
      .join(a2, col("k") === col("k2"), "left")
      .join(a3, col("k") === col("k3"), "left")
      .select(col("k"), col("sv"), col("cnt"), col("mv"))
    assert(nAggs(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(nJoins(q) == 1)
    assert(q.orderBy("k").collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq
      == Seq((1L, Some(30L), Some(2L), Some(10L)),
        (2L, Some(70L), Some(2L), Some(30L)),
        (3L, Some(50L), Some(1L), Some(50L)),
        (4L, None, None, None)))
  }

  test("inner-join siblings fuse and keep inner semantics") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.groupBy(col("fk").as("k2")).agg(count(lit(1)).as("cnt"))
    val q = base.join(a1, col("k") === col("k1"))
      .join(a2, col("k") === col("k2"))
      .select(col("k"), col("sv"), col("cnt"))
    assert(nAggs(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(q.orderBy("k").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 30L, 2L), (2L, 70L, 2L), (3L, 50L, 1L)))
  }

  test("different grouping keys do NOT fuse") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.groupBy(col("v").as("k2")).agg(count(lit(1)).as("cnt"))
    val q = base.join(a1, col("k") === col("k1"), "left")
      .join(a2, col("k") === col("k2"), "left")
    assert(nAggs(q) == 2)
    assert(nJoins(q) == 2)
  }

  test("differently-filtered children do NOT fuse") {
    val c = child
    val a1 = c.filter(col("s") === "x").groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.filter(col("s") === "y").groupBy(col("fk").as("k2")).agg(count(lit(1)).as("cnt"))
    val q = base.join(a1, col("k") === col("k1"), "left")
      .join(a2, col("k") === col("k2"), "left")
    assert(nAggs(q) == 2)
    // and the row-level result is the unfused one
    val got = q.select(col("k"), col("sv"), col("cnt")).orderBy("k").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(got == Seq(
      (1L, Some(10L), Some(1L)), (2L, Some(30L), None),
      (3L, None, Some(1L)), (4L, None, None)))
  }

  test("DISTINCT aggregates do NOT fuse (would force Expand planning)") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(countDistinct("s").as("ds"))
    val a2 = c.groupBy(col("fk").as("k2")).agg(countDistinct("v").as("dv"))
    val q = base.join(a1, col("k") === col("k1"), "left")
      .join(a2, col("k") === col("k2"), "left")
    assert(nJoins(q) == 2)
  }

  test("mixed join types do NOT fuse") {
    val c = child
    val a1 = c.groupBy(col("fk").as("k1")).agg(sum("v").as("sv"))
    val a2 = c.groupBy(col("fk").as("k2")).agg(count(lit(1)).as("cnt"))
    val q = base.join(a1, col("k") === col("k1"), "inner")
      .join(a2, col("k") === col("k2"), "left")
    assert(nAggs(q) == 2)
  }

  test("c13 registry query (the reference A11 DAG shape) plans one lineitem aggregate") {
    val q = graft.SparkEntry.queries("c13_file_metadata_dag")(spark, "/root/testdata/sf0.001")
    assert(nAggs(q) == 1, q.queryExecution.optimizedPlan.toString)
    assert(nJoins(q) == 1)
    assert(q.count() > 0)
  }
}
