package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("verdict rollup counts docs and distinct parents") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "an entirely different document about spark physical plans"),
      (3L, "the quick brown fox jumps over the lazy dog today") // dup of 1 in corpus
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),   // exact dup (keeper 1)
      (11L, "the quick brown fox jumps over the lazy dog tonight"), // near dup of 1/3
      (12L, "completely fresh content never before observed here ok")
    ).toDF("doc_id", "text")
    val got = Dedup.snapshotDiffReport(batch, corpus, "text", "doc_id",
        family = PortableFamily)
      .select("verdict", "n_docs", "n_distinct_parents")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("exact_dup") == ((1L, 1L)))
    assert(got("unique") == ((1L, 0L)), "unique rows have null dup_of -> 0 parents")
    assert(got.get("near_dup").forall(_._1 >= 1L), "the tweaked doc should near-dup")
    assert(got.values.map(_._1).sum == 3L, "every batch doc gets exactly one verdict")
  }
}
