package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Recall@k quality gate for the approximate ANN paths: lshTopK and ivfTopK
 * are hash-exact against oracles that replay the same buckets, but the
 * number a user actually tunes nPlanes/nProbe against is recall vs the
 * EXACT top-k. The measurements live in [[RecallMetrics]] (shared with
 * `graft.tools.RecallReport`, which emits them as `bench/RECALL.json` each
 * round); this spec asserts the floors. The exact baseline is computed IN
 * THE DRIVER from collected vectors — an independent definition sharing no
 * code with the Spark paths — with the same 6-dp-rounded-sim, id-asc
 * tie-break as the rank keys, so boundary ties cannot flap the measurement.
 * Mirrors DedupSpec's recall-vs-exact-Jaccard gate for MinHash-LSH.
 *
 * Floors are set ~5 pts under the measured values (see COVERAGE.md and
 * bench/RECALL.json) so a real recall regression (a broken bucket fn, a
 * wrong probe set) trips the gate while fixture-level jitter cannot.
 */
class AnnRecallSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("lshTopK recall@5 vs exact top-5 at registered params (6 planes × 8 tables)") {
    val r = RecallMetrics.lshRecallAt5(spark, sfDir)
    info(f"LSH recall@5 = $r%.3f at nPlanes=6 × nTables=8, 16 queries")
    assert(r >= 0.85, f"LSH recall@5 regressed: $r%.3f < 0.85")
  }

  test("single-table LSH at the old params documents WHY amplification is the default") {
    val r = RecallMetrics.lshRecallAt5(spark, sfDir, nPlanes = 12, nTables = 1)
    info(f"single 12-plane table recall@5 = $r%.3f (the r7 registered form)")
    // regression guard inverted: if this ever gets GOOD, the fixture
    // stopped being a meaningful amplification testbed
    assert(r < 0.5, f"fixture no longer discriminates: single-table recall $r%.3f")
  }

  test("ivfTopK recall@5 vs exact top-5 at registered params (8 cells, nProbe=2)") {
    val r = RecallMetrics.ivfRecallAt5(spark, sfDir, nProbe = 2)
    info(f"IVF recall@5 = $r%.3f at 8 first-k cells, nProbe=2, 8 queries")
    assert(r >= 0.70, f"IVF recall@5 regressed: $r%.3f < 0.70")
  }

  test("embeddingNearDups: table amplification recovers planted high-sim pairs") {
    // the parquet fixture is near-random (max pair cosine 0.51) — REAL
    // near-dups live at cosine >= 0.9, so RecallMetrics plants them:
    // jitter 0.45× the component scale puts twin cosine ≈ 0.88-0.93, the
    // regime where a single table provably misses most pairs (p⁸ ≈ 0.3)
    // and amplification earns its keep
    val planted = RecallMetrics.plantedFixture(spark)
    assert(planted.truePairs.size >= 30,
      s"fixture degenerate: only ${planted.truePairs.size} true pairs")
    val r1 = RecallMetrics.plantedPairRecall(spark, nTables = 1)
    val r8 = RecallMetrics.plantedPairRecall(spark, nTables = 8)
    info(f"planted-dup pair recall (${planted.truePairs.size} true pairs): 1 table $r1%.2f, 8 tables $r8%.2f")
    assert(r8 >= 0.85, f"amplified detector missed planted dups: $r8%.2f < 0.85")
    assert(r8 > r1, "amplification must improve pair recall")

    // lshKnnJoin on the same planted fixture: each twin's TRUE nearest
    // neighbor is its partner (cos ≈ 0.9 vs ≤ ~0.5 for everything else),
    // so the kNN join must put the partner at rank 1 whenever any of its
    // tables co-buckets the pair — the same amplification economics as
    // the pair detector, measured in the rank-1 position a retrieval
    // user consumes
    val rKnn = RecallMetrics.knnRank1Recall(spark)
    info(f"kNN-join rank-1 partner recall: $rKnn%.2f")
    assert(rKnn >= 0.85, f"kNN join missed planted partners at rank 1: $rKnn%.2f < 0.85")
  }

  test("marginBitextMineLsh recovers the exact form's mined pairs (the l84 quality gate)") {
    // sides = id parity on the planted fixture: each base's aligned twin
    // is the other side's mutual top-1 — the bitext shape. The oracle
    // proves the candidate path computes what it retrieves; this floor
    // gates what it RETRIEVES vs the exact all-pairs miner.
    val r = RecallMetrics.bitextPairRecall(spark, nTables = 8)
    info(f"bitext candidate-path pair recall vs exact: $r%.2f")
    assert(r >= 0.85, f"LSH bitext mining missed exact pairs: $r%.2f < 0.85")
  }

  test("ivfTopK recall improves with nProbe (the knob a user turns)") {
    val r2 = RecallMetrics.ivfRecallAt5(spark, sfDir, nProbe = 2)
    val r8 = RecallMetrics.ivfRecallAt5(spark, sfDir, nProbe = 8)
    info(f"IVF recall@5: nProbe=2 → $r2%.3f, nProbe=8 (all cells) → $r8%.3f")
    // probing every cell IS exhaustive search — recall must be 1.0
    assert(r8 === 1.0, f"nProbe=all must be exact, got $r8%.3f")
    assert(r8 >= r2, "recall must be monotone in nProbe")
  }
}
