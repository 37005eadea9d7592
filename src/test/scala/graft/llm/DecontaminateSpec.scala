package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DecontaminateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("planted benchmark leak is flagged with its shared-ngram count; clean docs are not") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta suffix"), // contains bench
      (2L, "completely different content with no overlap at all here"),
      (3L, "alpha beta gamma delta epsilon only")) // one 5-gram shared
      .toDF("doc_id", "text")
    val got = Decontaminate.flaggedDocs(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long)].collect().toMap
    // bench doc has 3 distinct 5-grams; doc 1 contains all of them
    assert(got === Map(1L -> 3L, 3L -> 1L))
  }

  test("the benchmark side plans as a broadcast join (no shuffle of corpus text)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Decontaminate.flaggedDocs(
        docs.filter($"doc_id" % 50 =!= 0), docs.filter($"doc_id" % 50 === 0),
        "text", "doc_id", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("contaminationScore: fractions hand-computed, clean docs report zero") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon zeta eta suffix"), // 6 shingles, 3 shared
      (2L, "completely different content with no overlap at all here"),    // 9 words → 5 shingles, 0 shared
      (3L, "alpha beta gamma delta epsilon only"))                         // 2 shingles, 1 shared
      .toDF("doc_id", "text")
    val got = Decontaminate.contaminationScore(corpus, bench, "text", "doc_id", n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, tot, sh, c) => id -> ((tot, sh, c)) }.toMap
    assert(got(1L) === ((6L, 3L, 0.5)))
    assert(got(2L) === ((5L, 0L, 0.0))) // the zero a release gate needs
    assert(got(3L) === ((2L, 1L, 0.5)))
  }

  test("repetition filters: hand-computed fractions, degenerate docs score high") {
    val docs = Seq(
      (1L, "buy buy buy buy now"),              // top token 4/5, uniq 2/5
      (2L, "all words here are distinct"),      // top 1/5, uniq 1.0
      (3L, "go go go go"),                      // bigram "go go" 3/3
      (4L, "solo"),                             // 1 token → no bigrams (null)
      (5L, "")).toDF("doc_id", "text")          // token-less → absent
    val got = RepetitionStats.repetitionStats(docs, "doc_id", "text")
      .as[(Long, Double, Option[Double], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((0.8, Some(0.75), 0.4))) // bigram (buy buy) 3 of 4
    assert(got(2L) === ((0.2, Some(0.25), 1.0)))
    assert(got(3L) === ((1.0, Some(1.0), 0.25)))
    assert(got(4L) === ((1.0, None, 1.0)))
    assert(!got.contains(5L))
  }

  test("scrubPii redacts emails before phones; piiCount counts raw matches") {
    val rows = Seq(
      "reach me at jane.doe+x@sub.example.org today",
      "call +1 (555) 010-0042 now",
      "both a@b.co and 555-123-4567 appear",
      "no pii here at all").toDF("text")
    val got = rows.select(TextOps.scrubPii($"text").as("s"), TextOps.piiCount($"text").as("n"))
      .as[(String, Long)].collect().toSeq
    assert(got(0) === ("reach me at <EMAIL> today", 1L))
    assert(got(1) === ("call <PHONE> now", 1L))
    assert(got(2) === ("both <EMAIL> and <PHONE> appear", 2L))
    assert(got(3) === ("no pii here at all", 0L))
  }
}
