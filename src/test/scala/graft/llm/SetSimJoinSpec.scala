package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Exact prefix-filtered set-similarity join: completeness (equals the
 * all-pairs brute force on a fixture), boundary inclusion at exactly
 * tau, and exclusion below it.
 */
class SetSimJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], tNum: Int, tDen: Int) = {
    val sets = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSet }.toMap
    (for {
      (i, si) <- sets; (j, sj) <- sets if i < j
      inter = (si & sj).size
      if inter * tDen >= (si.size + sj.size - inter) * tNum
    } yield (i, j, si.size.toLong, sj.size.toLong, inter.toLong)).toSet
  }

  private val fixture: Seq[(Long, String)] = Seq(
    1L -> "a b c d e",       // vs 2: inter 4 / union 6 = 0.667 >= 0.6
    2L -> "a b c d f",
    3L -> "x y z w q",       // disjoint from 1/2
    4L -> "a b c",           // vs 1: 3/5 = 0.6 exactly (boundary, INCLUDED)
    5L -> "a b",             // vs 4: 2/3 = 0.667; vs 1: 2/5 = 0.4 (excluded)
    6L -> "p p p q",         // duplicate tokens collapse: set {p,q}
    7L -> "q p",             // vs 6: identical sets -> jaccard 1.0
    8L -> "m n o r s t u v"  // singleton, no partner
  )

  test("equals the all-pairs brute force, including the tau boundary") {
    val df = fixture.toDF("doc_id", "text")
    val got = SetSimJoin.prefixJaccardJoin(df, "text", "doc_id", tNum = 3, tDen = 5)
      .select("id1", "id2", "size1", "size2", "inter")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == bruteForce(fixture, 3, 5))
    assert(got.contains((1L, 4L, 5L, 3L, 3L)), "exact-boundary pair 1-4 must be included")
    assert(!got.exists(p => p._1 == 1L && p._2 == 5L), "0.4 pair must be excluded")
    assert(got.contains((6L, 7L, 2L, 2L, 2L)), "multiset input joins as a SET (jaccard 1)")
  }

  test("reported jaccard is the exact ratio rounded to 6 dp") {
    val df = fixture.toDF("doc_id", "text")
    val j = SetSimJoin.prefixJaccardJoin(df, "text", "doc_id", 3, 5)
      .filter("id1 = 1 AND id2 = 2").select("jaccard").as[Double].head()
    assert(j == math.rint(4.0 / 6.0 * 1e6) / 1e6 || j == 0.666667)
  }

  test("no pairs when nothing clears the threshold") {
    val df = Seq(1L -> "a b c", 2L -> "d e f", 3L -> "g h i").toDF("doc_id", "text")
    assert(SetSimJoin.prefixJaccardJoin(df, "text", "doc_id", 3, 5).count() == 0L)
  }

  // --- containmentJoin ---

  test("containment finds the quoted-paragraph pair Jaccard misses") {
    // doc 2 IS a contiguous slice of doc 1: every 2-gram shingle of doc 2
    // occurs in doc 1 -> containment 1.0; Jaccard is only 4/13 (< 0.6)
    val df = Seq(
      1L -> "a b c d e f g h i j k l m n",
      2L -> "d e f g h",
      3L -> "x y z w q r"
    ).toDF("doc_id", "text")
    val got = SetSimJoin.containmentJoin(df, "text", "doc_id", n = 2, tNum = 1, tDen = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.length === 1)
    val (idIn, idOut, nIn, nOut, inter, cont) = got.head
    assert(idIn === 2L && idOut === 1L, "direction: smaller doc is the contained one")
    assert(nIn === 4L && nOut === 13L && inter === 4L && cont === 1.0)
    // the same pair does NOT clear symmetric Jaccard at the same threshold
    assert(SetSimJoin.prefixJaccardJoin(df, "text", "doc_id", 1, 2).count() === 0L)
  }

  test("containment threshold is exact-integer: boundary included, below excluded") {
    // doc 1 has 4 2-gram shingles, exactly 2 of them in doc 2 -> 1/2 boundary
    val df = Seq(
      1L -> "a b c x p",      // shingles: ab bc cx xp
      2L -> "a b c d e f g"   // shingles: ab bc cd de ef fg (shares ab, bc)
    ).toDF("doc_id", "text")
    val atHalf = SetSimJoin.containmentJoin(df, "text", "doc_id", 2, 1, 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(atHalf.length === 1 && atHalf.head._1 === 1L && atHalf.head._5 === 2L)
    val aboveHalf = SetSimJoin.containmentJoin(df, "text", "doc_id", 2, 3, 5)
      .count()
    assert(aboveHalf === 0L, "2/4 = 0.5 < 3/5: pair must be excluded above the boundary")
  }
}
