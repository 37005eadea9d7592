package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HardNegativesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val fixture = Seq(
    (0L, Array(1.0f, 0.0f), 0),   // the query (label 0)
    (1L, Array(0.9f, 0.1f), 1),   // closest cross-label -> rank 1
    (2L, Array(0.5f, 0.5f), 1),   // cos ~0.707
    (3L, Array(0.0f, 1.0f), 1),   // orthogonal -> rank 3
    (4L, Array(0.99f, 0.01f), 0), // SAME label: excluded despite max sim
    (5L, Array(0.8f, 0.2f), 2),   // tie pair: identical vectors,
    (6L, Array(0.8f, 0.2f), 2)    //   id asc breaks the tie
  ).toDF("vec_id", "embedding", "label")

  test("top-k cross-label only, same-label never surfaces") {
    val got = Ann.hardNegatives(fixture,
        fixture.filter(col("vec_id") === 0), "embedding", "vec_id", "label", k = 2)
      .select("corpus_id", "rank").as[(Long, Long)].collect().toMap
    // cos(q,1) ~0.994 > cos(q,5) ~0.970 > cos(q,2) ~0.707
    assert(got == Map(1L -> 1L, 5L -> 2L))
  }

  test("equal sims tie-break on corpus id ascending") {
    val got = Ann.hardNegatives(fixture,
        fixture.filter(col("vec_id") === 0), "embedding", "vec_id", "label", k = 6)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 5L, 6L, 2L, 3L))
    assert(!got.contains(4L), "label-0 corpus vector must never appear for a label-0 query")
  }

  test("all corpus rows share the query label -> empty") {
    val same = fixture.withColumn("label", lit(7))
    assert(Ann.hardNegatives(same, same.filter(col("vec_id") === 0),
      "embedding", "vec_id", "label", k = 3).count() == 0L)
  }
}
