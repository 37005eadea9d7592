package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("vocabGrowth: planted first-seen buckets, cumulative total = vocabulary") {
    // ids 0..3, 2 buckets: bucket 0 = ids {0,1}, bucket 1 = ids {2,3}
    val docs = Seq(
      0L -> "a b",      // a,b first seen in bucket 0
      1L -> "b c",      // c new in bucket 0
      2L -> "a d",      // d new in bucket 1
      3L -> "e e b").toDF("doc_id", "text")
    val rows = CorpusStats.vocabGrowth(docs, "doc_id", TextOps.whitespaceTokens(col("text")), nBuckets = 2)
      .orderBy("bucket")
      .select("bucket", "new_types", "new_type_docfreq", "cum_types")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // dfs: a=2 docs, b=3, c=1 (bucket 0: 2+3+1=6); d=1, e=1 (bucket 1: 2)
    assert(rows == Seq((0L, 3L, 6L, 3L), (1L, 2L, 2L, 5L)))
    assert(rows.last._4 == 5L, "cumulative = |{a,b,c,d,e}|")
  }

  test("vocabGrowth: sparse ids bucket over the id RANGE, not rank") {
    // max id 19 -> n_ids 20, 10 buckets of width 2: id 0 -> bucket 0, id 19 -> bucket 9
    val docs = Seq(0L -> "x", 19L -> "y").toDF("doc_id", "text")
    val m = CorpusStats.vocabGrowth(docs, "doc_id", TextOps.whitespaceTokens(col("text")), nBuckets = 10)
      .select("bucket", "new_types").as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 1L, 9L -> 1L))
  }

  test("dupSizeHistogram: exact removable weight keeps the min-id member") {
    val df = Seq(
      (1L, "k1", 10L), (2L, "k1", 30L), (3L, "k1", 20L), // size 3, keeper w=10, removable 50
      (4L, "k2", 7L), (5L, "k2", 5L),                    // size 2, keeper w=7, removable 5
      (6L, "k3", 99L)                                    // singleton, removable 0
    ).toDF("id", "key", "w")
    val got = CorpusStats.dupSizeHistogram(df, "key", "id", "w")
      .select("group_size", "n_groups", "n_redundant_docs", "removable_weight")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 1L, 2L, 50L), (2L, 1L, 1L, 5L), (1L, 1L, 0L, 0L)))
  }
}
