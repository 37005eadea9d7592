package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Hand-computed semantics for the retrieval ops: inverted-index postings,
  * BM25 ranking, the LSH kNN self-join, and SemDeDup-style semantic dedup. */
class IndexSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat"),
    (2L, "cat cat cat"),
    (3L, "   "),
    (4L, "The MAT and the CAT")
  ).toDF("doc_id", "text")

  test("invertedIndex: df / tf_total / ordered capped postings") {
    val idx = Index.invertedIndex(docs, "doc_id", "text", minDf = 2, maxPostings = 2)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // 'the': docs 0 (tf 2), 1 (tf 1), 4 (tf 2) → df 3, tf_total 5, postings capped at 2
    assert(idx("the") === ("the", 3L, 5L, "0:2|1:1"))
    // 'cat': docs 0, 2 (tf 3), 4 → df 3, tf_total 5
    assert(idx("cat") === ("cat", 3L, 5L, "0:1|2:3"))
    assert(idx("mat") === ("mat", 2L, 2L, "0:1|4:1"))
    assert(idx("sat") === ("sat", 2L, 2L, "0:1|1:1"))
    // df=1 tokens pruned; blank doc contributes nothing
    assert(!idx.contains("dog") && !idx.contains("on") && !idx.contains("and"))
  }

  test("bm25TopK: rarer term outranks common term at equal tf; tf saturates") {
    // 'dog' (df 1) must score doc 1 above what 'the' (df 3) gives doc 0
    val scores = Index.bm25TopK(docs, "doc_id", "text",
      terms = Seq("dog", "the"), topK = 5)
      .as[(Long, Double)].collect().toMap
    assert(scores.contains(1L) && scores.contains(0L) && scores.contains(4L))
    assert(scores(1L) > scores(0L), s"doc1(dog)=${scores(1L)} doc0(the)=${scores(0L)}")
    // doc 3 (blank) and doc 2 (no query terms) never appear
    assert(!scores.contains(3L) && !scores.contains(2L))
    // top-k truncation
    assert(Index.bm25TopK(docs, "doc_id", "text", Seq("the"), topK = 1).count() === 1L)
  }

  test("tfidfTopTerms: characteristic terms outrank shared ones; stopword cut applies") {
    // 4 docs: 'cat' df=1 (characteristic of doc0), 'sat' df=2, 'the' df=4
    val d = Seq(
      (0L, "cat cat sat"), (1L, "dog sat"), (2L, "bird flew"), (3L, "fish swam")
    ).toDF("doc_id", "text")
    val out = Index.tfidfTopTerms(d, "doc_id", "text", topK = 2, maxDfFrac = 0.5)
      .as[(Long, String, Long, Double)].collect()
    val doc0 = out.filter(_._1 == 0L).sortBy(_._3)
    // tf=2 · ln(4/1) beats tf=1 · ln(4/2)
    assert(doc0.map(_._2).toSeq === Seq("cat", "sat"))
    val exp = BigDecimal(2.0 * math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(doc0.head._4 === exp)
    // a df=4 token would be cut at maxDfFrac 0.5 (df > 2 of 4)
    val all = Index.tfidfTopTerms(
      Seq((0L, "the cat"), (1L, "the dog"), (2L, "the owl"), (3L, "the elk"))
        .toDF("doc_id", "text"), "doc_id", "text", topK = 5, maxDfFrac = 0.5)
      .as[(Long, String, Long, Double)].collect()
    assert(!all.exists(_._2 == "the"))
    assert(all.length === 4) // each doc keeps its own animal
  }

  private def clusteredVecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.99f, 0.14f, 0f, 0f)),   // ~cos 0.99 with 0
    (2L, Array(0.95f, 0.31f, 0f, 0f)),   // same neighborhood
    (3L, Array(0f, 0f, 1f, 0f)),
    (4L, Array(0f, 0.1f, 0.99f, 0f))
  ).toDF("vec_id", "embedding")

  test("lshKnnJoin: every id gets at most k ranked neighbors, nearest first") {
    val knn = Ann.lshKnnJoin(clusteredVecs, "embedding", "vec_id", dim = 4,
        k = 2, nPlanes = 2, nTables = 4)
      .as[(Long, Long, Long, Double)].collect()
    val byId = knn.groupBy(_._1)
    byId.values.foreach { rows =>
      assert(rows.length <= 2)
      val ranked = rows.sortBy(_._3)
      assert(ranked.map(_._3).toSeq === (1L to ranked.length).toSeq)
      // rank order follows descending similarity
      assert(ranked.map(_._4).toSeq === ranked.map(_._4).sortBy(-_).toSeq)
    }
    // the tight pair 0–1 must find each other at rank 1 (4 tables of 2
    // planes at cos .99 ⇒ recall ≈ 1)
    assert(byId(0L).minBy(_._3)._2 === 1L)
    assert(byId(1L).minBy(_._3)._2 === 0L)
  }

  test("semanticDedup: keep-first inside cells, singleton cells untouched") {
    val centroids = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val out = Ann.semanticDedup(clusteredVecs, "embedding", "vec_id",
        centroids, threshold = 0.9)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // cell 0 holds {0,1,2}: 1 and 2 have lower-id neighbors at cos ≥ 0.9 → dropped
    assert(out(0L) === ((0L, 0L, true)))
    assert(out(1L) === ((1L, 0L, false)))
    assert(out(2L) === ((2L, 0L, false)))
    // cell 1 holds {3,4}: cos(3,4) ≈ 0.995 ≥ 0.9 → 4 dropped, 3 kept
    assert(out(3L) === ((3L, 1L, true)))
    assert(out(4L) === ((4L, 1L, false)))
    // a high threshold keeps everything
    val all = Ann.semanticDedup(clusteredVecs, "embedding", "vec_id",
        centroids, threshold = 0.9999)
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    assert(all === 5L)
  }

  test("semanticDedup: oversized cells produce no pairs (members all kept)") {
    val centroids = Seq(Array(1f, 0f, 0f, 0f))
    val out = Ann.semanticDedup(clusteredVecs, "embedding", "vec_id",
        centroids, threshold = 0.0, maxCellSize = 2)
      .filter(org.apache.spark.sql.functions.col("kept")).count()
    assert(out === 5L) // single cell of 5 > cap 2 → no drops
  }
}
