package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class JoinOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("orOfKeysJoin equals the OR theta join, without a nested loop") {
    val left = Seq(("1-2", "x"), ("3-1", "y"), ("9-9", "z")).toDF("code", "payload")
    val right = Seq((1L, "s1"), (2L, "s2"), (3L, "s3")).toDF("key", "name")
    val out = JoinOps.orOfKeysJoin(left, right,
      Seq(regexp_extract(col("code"), "^([0-9]+)-", 1).cast("long"),
        regexp_extract(col("code"), "-([0-9]+)$", 1).cast("long")), "key")
    val got = out.select("code", "key").as[(String, Long)].collect().toSet
    // "1-2" matches keys 1 and 2; "3-1" matches 3 and 1; "9-9" matches none
    assert(got === Set(("1-2", 1L), ("1-2", 2L), ("3-1", 3L), ("3-1", 1L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("saltedJoin result identical to the plain join") {
    val big = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d")).toDF("k", "v")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val salted = JoinOps.saltedJoin(big, small, "k", buckets = 4)
      .select("k", "v", "name").as[(Long, String, String)].collect().toSet
    val plain = big.join(small, "k")
      .select("k", "v", "name").as[(Long, String, String)].collect().toSet
    assert(salted === plain)
  }

  test("saltedJoin left-outer keeps unmatched big-side rows") {
    val big = Seq((1L, "a"), (9L, "x")).toDF("k", "v")
    val small = Seq((1L, "one")).toDF("k", "name")
    val out = JoinOps.saltedJoin(big, small, "k", buckets = 3, joinType = "left")
      .select("k", "name").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "one"), (9L, null)))
  }

  test("skewReport: exact shares, rank tie-break, and the max/mean skew factor") {
    // key 0: 6 rows, key 1: 2, key 2: 2, key 3: 1, key 4: 1 — 12 rows, 5 keys
    val df = (Seq.fill(6)(0L) ++ Seq(1L, 1L, 2L, 2L, 3L, 4L)).toDF("k")
    val out = JoinOps.skewReport(df, "k", topK = 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // skew factor = max·keys/rows = 6·5/12 = 2.5 → 2500000 micro
    assert(out.toSeq === Seq(
      (1L, 0L, 6L, 500000L, 2500000L),
      (2L, 1L, 2L, 166666L, 2500000L),   // ties (1,2) rank by key asc
      (3L, 2L, 2L, 166666L, 2500000L)))
  }

  test("skewReport: uniform keys report a skew factor of ~1") {
    val df = (0L until 40L).map(i => i % 8).toDF("k")
    val out = JoinOps.skewReport(df, "k", topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.forall(_._5 === 1000000L), s"uniform must be 1.0: ${out.toSeq}")
  }

  test("skewReport: skew factor survives _max·10⁶·_keys past int64 (ADVICE r10)") {
    import org.apache.spark.sql.functions.{col, when}
    // one 5M-row heavy key + 5M singletons: _max·10⁶·_keys = 5e6·1e6·(5e6+1)
    // ≈ 2.5e19 wraps int64 (the pre-fix path went negative); the DECIMAL
    // widening must yield the exact floor(_max·1e6·_keys/_rows)
    val df = spark.range(0L, 10000000L)
      .select(when(col("id") < 5000000L, 0L).otherwise(col("id")).as("k"))
    val top = JoinOps.skewReport(df, "k", topK = 1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // 5000000·1000000·5000001 div 10000000 = 2500000500000
    assert(top === ((1L, 0L, 5000000L, 500000L, 2500000500000L)))
  }
}
