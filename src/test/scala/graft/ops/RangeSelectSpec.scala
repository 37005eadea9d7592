package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Range-partitioned exact selection must reproduce Spark's `percentile`
 * bit-for-bit on every distribution shape that stresses the router:
 * skew (one range holds most rows), heavy ties (rank runs), groups too
 * small to sample (null-bounds degenerate path), and n=1/n=2 edges.
 */
class RangeSelectSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def check(rows: Seq[(String, Double)], ps: Seq[(String, Double)],
                    nRanges: Int = 8): Unit = {
    val df = rows.toDF("g", "v")
    val got = RangeSelect.exactPercentilesByGroup(df, "g", col("v"), ps, nRanges)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    val exact = ps.map { case (_, p) => expr(s"percentile(v, $p)") }
    val want = df.groupBy("g")
      .agg(exact.head, exact.tail: _*)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1)))
      .toMap
    assert(got.keySet === want.keySet)
    for (k <- want.keySet) assert(got(k) === want(k), s"group $k")
  }

  test("matches percentile() on a skewed distribution (zipf-ish)") {
    val rows = (1 to 3000).map { i =>
      ("a", math.pow(1.13, i % 60) * (1 + i % 7))
    } ++ (1 to 500).map(i => ("b", (i % 13).toDouble * 100))
    check(rows, Seq(("p10", 0.1), ("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
  }

  test("heavy ties: rank runs spanning range boundaries") {
    val rows = Seq.fill(800)(("t", 5.0)) ++ Seq.fill(700)(("t", 9.0)) ++
      (1 to 100).map(i => ("t", i.toDouble))
    check(rows, Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)))
  }

  test("groups too small to sample route everything to range 0") {
    val rows = Seq(("s", 3.0), ("s", 1.0), ("s", 2.0), ("one", 42.0),
      ("two", 7.0), ("two", 11.0))
    check(rows, Seq(("p50", 0.5), ("p90", 0.9)), nRanges = 4)
  }

  test("p=0 and p=1 hit the group min/max exactly") {
    val rows = (1 to 2000).map(i => ("m", math.sin(i).abs * 1e6))
    check(rows, Seq(("p0", 0.0), ("p100", 1.0)))
  }
}
