package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Property audits for the xxhash64 dedup scale paths (DedupAudit —
 * l5/l6/l7/l8/l13's registered form): the planted-pair ground truth is
 * cross-checked against brute force, and each audit must come back
 * all-green on a corpus with planted exact and near duplicates.
 */
class DedupAuditSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  // 0/1 exact dups (shingle-J 1); 2 a one-token edit (shingle-J ≥ 0.7 but
  // < 0.9 — NOT planted at τ=9/10); 5/6 long near-identical docs whose
  // one-token tail edit keeps shingle-J ≥ 0.9 (planted)
  private val longBase = (1 to 40).map(i => s"tok$i").mkString(" ")
  private def docs = Seq(
    (0L, base),
    (1L, base),
    (2L, base.replace("lazy", "sleepy")),
    (3L, "completely different content about spark catalyst optimizer rules engine"),
    (4L, "unrelated short text"),
    (5L, longBase + " alpha"),
    (6L, longBase + " beta")
  ).toDF("doc_id", "text")

  private def metrics(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  test("plantedPairs matches brute-force shingle-set Jaccard at tau = 9/10") {
    val got = DedupAudit.plantedPairs(docs, "text", "doc_id", n = 3, 9, 10)
      .as[(Long, Long)].collect().toSet
    // brute force over all pairs via the same shingle definition
    val sh = docs.select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val expect = (for {
      a <- sh.keys; b <- sh.keys if a < b
      sa = sh(a).toSet; sb = sh(b).toSet
      if sa.nonEmpty && (sa & sb).size * 10 >= (sa | sb).size * 9
    } yield (a, b)).toSet
    assert(expect === Set((0L, 1L), (5L, 6L)), s"fixture drifted: $expect")
    assert(got === expect)
  }

  test("minhash candidate audit: planted found, sound, canonical (l5)") {
    val m = metrics(DedupAudit.minhashCandidateAudit(docs, "text", "doc_id"))
    assert(m("planted_pairs") === 2L)
    assert(m("planted_missed") === 0L)
    assert(m("zero_overlap_pairs") === 0L)
    assert(m("misordered") === 0L && m("dup_rows") === 0L)
  }

  test("verified near-dup audit: threshold and Jaccard re-verified (l6)") {
    val m = metrics(DedupAudit.nearDupPairsAudit(docs, "text", "doc_id", threshold = 0.5))
    assert(m("planted_pairs") === 2L)
    assert(m("planted_missed") === 0L)
    assert(m("below_threshold") === 0L)
    assert(m("jaccard_mismatch") === 0L)
    assert(m("misordered") === 0L && m("dup_rows") === 0L)
  }

  test("simhash audit: identical token multisets are planted and found (l7)") {
    // doc 7 is doc 0's tokens REVERSED — same multiset, so SimHash is
    // identical (hamming 0) and the pair is guaranteed
    val withPerm = docs.unionByName(
      Seq((7L, base.split(" ").reverse.mkString(" "))).toDF("doc_id", "text"))
    val m = metrics(DedupAudit.simhashAudit(withPerm, "text", "doc_id"))
    assert(m("planted_pairs") === 3L) // {0,1,7} is one multiset group: (0,1),(0,7),(1,7)
    assert(m("planted_missed") === 0L)
    assert(m("low_overlap_pairs") === 0L)
    assert(m("misordered") === 0L && m("dup_rows") === 0L)
  }

  test("fingerprint audit: sequence-pure, collision-free, order-sensitive (l8)") {
    val withWs = docs.unionByName(Seq(
      (8L, "  the quick brown fox jumps over the lazy dog and runs far away home  "),
      (9L, base.split(" ").reverse.mkString(" "))).toDF("doc_id", "text"))
    val m = metrics(DedupAudit.fingerprintAudit(withWs, "text", "doc_id"))
    assert(m("n_docs") === 9L)
    // 0/1/8 share one token sequence; 9 (reversed) is its own key
    assert(m("distinct_keys") === 7L)
    assert(m("key_fp_mismatch") === 0L)
    assert(m("fp_collisions") === 0L)
    assert(m("order_collisions") === 0L)
  }

  test("clusters audit: planted co-clustered, labels converged (l13)") {
    val m = metrics(DedupAudit.clustersAudit(docs, "text", "doc_id"))
    assert(m("planted_pairs") === 2L)
    assert(m("split_planted") === 0L)
    assert(m("edge_violations") === 0L)
    assert(m("keeper_violations") === 0L)
    assert(m("dup_ids") === 0L && m("uncovered_ids") === 0L)
  }

  test("clusters audit: a cap-dropped mega-cluster is candidate recall, " +
    "not a split (the CORRECTNESS_SKEW divergence)") {
    // 5 identical docs in one bucket with cap 4: the bucket drops WHOLE
    // by design, so the cap-ADMISSIBLE planted universe excludes the
    // whole exact-dup group — planted_pairs counts only the surviving
    // (5,6) pair, split_planted stays 0 (clustering-stage invariant),
    // and the mega-cluster's recall is DropStats/recall-gate territory
    val mega = (10L to 14L).map(i => (i, base)).toDF("doc_id", "text")
    val m = metrics(DedupAudit.clustersAudit(
      docs.filter($"doc_id" > 2).unionByName(mega), "text", "doc_id",
      maxBucketSize = 4))
    assert(m("planted_pairs") === 1L, m.toString) // just (5,6); mega excluded
    assert(m("split_planted") === 0L)
    assert(m("edge_violations") === 0L && m("dup_ids") === 0L)
    assert(m("uncovered_ids") === 0L)
  }

  test("cap-admissible planting also guards the pair audits (l5/l6/l7)") {
    // same mega-cluster through the MinHash candidate audit with cap 4:
    // planted_missed must be 0 because the over-cap exact-dup group is
    // not in the planted universe; the base docs' pairs still plant
    val mega = (10L to 14L).map(i => (i, base)).toDF("doc_id", "text")
    val m = metrics(DedupAudit.minhashCandidateAudit(
      docs.unionByName(mega), "text", "doc_id", maxBucketSize = 4))
    assert(m("planted_missed") === 0L, m.toString)
    assert(m("misordered") === 0L && m("dup_rows") === 0L)
    val m7 = metrics(DedupAudit.simhashAudit(
      docs.unionByName(mega), "text", "doc_id", maxBucketSize = 4))
    assert(m7("planted_missed") === 0L, m7.toString)
  }
}
