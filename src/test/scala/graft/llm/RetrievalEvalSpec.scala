package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RetrievalEvalSpec extends AnyFunSuite with SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("bruteForceTopKJoin: per-query parity with single-query bruteForceTopK") {
    val queries = emb.filter(col("vec_id") < 4)
    val multi = Ann.bruteForceTopKJoin(emb, queries, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    (0L until 4L).foreach { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val single = Ann.bruteForceTopK(emb, "embedding", "vec_id", qv,
          k = 5, excludeId = Some(qid))
        .collect().map(_.getLong(0)).toSeq
      assert(multi(qid) === single, s"query $qid")
    }
    // no BNLJ/cartesian in the plan (the constant-key device)
    val plan = Ann.bruteForceTopKJoin(emb, queries, "embedding", "vec_id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("retrievalMetrics: perfect results score 1.0, disjoint score 0.0") {
    import spark.implicits._
    val truth = Seq((0L, 10L), (0L, 11L), (1L, 20L), (1L, 21L))
      .toDF("query_id", "corpus_id")
    val perfect = Seq((0L, 10L, 0.9), (0L, 11L, 0.8), (1L, 20L, 0.7), (1L, 21L, 0.6))
      .toDF("query_id", "corpus_id", "cosine_sim")
    val p = RetrievalEval.retrievalMetrics(truth, perfect, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(p(0L) === ((2L, 1.0, 1.0)) && p(1L) === ((2L, 1.0, 1.0)))
    // query 1 gets junk results; query 0's second-ranked item is its only hit
    val partial = Seq((0L, 99L, 0.9), (0L, 11L, 0.8), (1L, 98L, 0.7))
      .toDF("query_id", "corpus_id", "cosine_sim")
    val q = RetrievalEval.retrievalMetrics(truth, partial, k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(q(0L) === ((1L, 0.5, 0.5))) // hit at rank 2 → rr = 0.5
    assert(q(1L) === ((0L, 0.0, 0.0))) // row preserved with zeros
  }

  test("retrievalMetrics on the l10 config matches the gated recall regime") {
    val queries = emb.filter(col("vec_id") < 16)
    val truth = Ann.bruteForceTopKJoin(emb, queries, "embedding", "vec_id", k = 5)
    val results = Ann.lshTopK(emb, queries, "embedding", "vec_id",
      dim = 64, k = 5, nPlanes = 6, nTables = 8)
    val m = RetrievalEval.retrievalMetrics(truth, results, k = 5).collect()
    assert(m.length === 16)
    val mean = m.map(_.getDouble(2)).sum / m.length
    // same configuration AnnRecallSpec gates at >= 0.85 (measured 0.925)
    assert(mean >= 0.85, s"mean recall@5 $mean")
  }
}
