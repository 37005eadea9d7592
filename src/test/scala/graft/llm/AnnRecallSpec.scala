package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Recall@k quality gate for the approximate ANN paths: lshTopK and ivfTopK
 * are hash-exact against oracles that replay the same buckets, but the
 * number a user actually tunes nPlanes/nProbe against is recall vs the
 * EXACT top-k. This spec measures both, at the registry's registered
 * parameters (l10: dim=64 k=5 nPlanes=12 over 16 queries; l12: 8 first-k
 * centroids, nProbe=2, k=5 over 8 queries), over the same sf0.001
 * embeddings fixture the registry rows run on, and asserts floors.
 *
 * The exact baseline is computed IN THE DRIVER from collected vectors — an
 * independent definition sharing no code with the Spark paths — with the
 * same 6-dp-rounded-sim, id-asc tie-break as the rank keys, so boundary
 * ties cannot flap the measurement. Mirrors DedupSpec's recall-vs-exact-
 * Jaccard gate for MinHash-LSH.
 *
 * Floors are set ~5 pts under the measured values (see COVERAGE.md) so a
 * real recall regression (a broken bucket fn, a wrong probe set) trips the
 * gate while fixture-level jitter cannot.
 */
class AnnRecallSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id").cast("long"), col("embedding"))

  /** (id → vector) for the whole 500-row fixture. */
  private lazy val all: Map[Long, Array[Double]] =
    emb.as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-k neighbor ids per query, rounded-sim desc then id asc —
    * the identical total order the Spark rank keys use. */
  private def exactTopK(queryIds: Seq[Long], k: Int): Map[Long, Set[Long]] =
    queryIds.map { q =>
      val qv = all(q)
      val top = all.iterator.filter(_._1 != q)
        .map { case (id, v) => (id, BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      q -> top.toSet
    }.toMap

  private def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]], k: Int): Double = {
    val hit = exact.iterator.map { case (q, ex) => (approx.getOrElse(q, Set.empty) & ex).size }.sum
    hit.toDouble / (exact.size * k)
  }

  test("lshTopK recall@5 vs exact top-5 at registered params (6 planes × 8 tables)") {
    val k = 5
    val queryIds = (0L until 16L).toSeq
    val got = Ann.lshTopK(emb, emb.filter(col("vec_id") < 16), "embedding", "vec_id",
        dim = 64, k = k, nPlanes = 6, nTables = 8)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val r = recall(got, exactTopK(queryIds, k), k)
    info(f"LSH recall@5 = $r%.3f at nPlanes=6 × nTables=8, 16 queries")
    assert(r >= 0.85, f"LSH recall@5 regressed: $r%.3f < 0.85")
  }

  test("single-table LSH at the old params documents WHY amplification is the default") {
    val k = 5
    val queryIds = (0L until 16L).toSeq
    val got = Ann.lshTopK(emb, emb.filter(col("vec_id") < 16), "embedding", "vec_id",
        dim = 64, k = k, nPlanes = 12, nTables = 1)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val r = recall(got, exactTopK(queryIds, k), k)
    info(f"single 12-plane table recall@5 = $r%.3f (the r7 registered form)")
    // regression guard inverted: if this ever gets GOOD, the fixture
    // stopped being a meaningful amplification testbed
    assert(r < 0.5, f"fixture no longer discriminates: single-table recall $r%.3f")
  }

  test("ivfTopK recall@5 vs exact top-5 at registered params (8 cells, nProbe=2)") {
    val k = 5
    val queryIds = (0L until 8L).toSeq
    val centroids = Ann.firstKCentroids(emb, "embedding", "vec_id", k = 8)
    val got = Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), "embedding", "vec_id",
        centroids, k = k, nProbe = 2)
      .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val r = recall(got, exactTopK(queryIds, k), k)
    info(f"IVF recall@5 = $r%.3f at 8 first-k cells, nProbe=2, 8 queries")
    assert(r >= 0.70, f"IVF recall@5 regressed: $r%.3f < 0.70")
  }

  test("embeddingNearDups: table amplification recovers planted high-sim pairs") {
    // the parquet fixture is near-random (max pair cosine 0.51) — REAL
    // near-dups live at cosine >= 0.9, so plant them: 60 base vectors,
    // each with a jittered twin (deterministic hash-derived components)
    def comp(seed: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((seed, d))
      h.toFloat / Int.MaxValue.toFloat
    }
    // jitter 0.45× the component scale puts twin cosine ≈ 0.88-0.93 — the
    // regime where a single table provably misses most pairs (p⁸ ≈ 0.3)
    // and amplification earns its keep
    val dim = 32
    val rows = (0 until 60).flatMap { i =>
      val base = Array.tabulate(dim)(d => comp(i, d))
      val twin = base.zipWithIndex.map { case (x, d) => x + 0.45f * comp(i + 1000, d) }
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, twin))
    }.toDF("vec_id", "embedding")
    // ground truth = planted pairs that actually cleared the threshold
    // (jitter is deterministic but the exact cosine varies per pair)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val planted = (0 until 60).map { i =>
      val base = Array.tabulate(dim)(d => comp(i, d))
      val twin = base.zipWithIndex.map { case (x, d) => x + 0.45f * comp(i + 1000, d) }
      ((i.toLong * 2, i.toLong * 2 + 1), cos(base, twin))
    }
    val truePairs = planted.collect { case (p, c) if c >= 0.9 => p }.toSet
    assert(truePairs.size >= 30, s"fixture degenerate: only ${truePairs.size} true pairs")
    def found(nTables: Int): Set[(Long, Long)] =
      Ann.embeddingNearDups(rows, "embedding", "vec_id", dim = dim,
          threshold = 0.9, nPlanes = 8, nTables = nTables)
        .select($"id1", $"id2").as[(Long, Long)].collect().toSet
        .intersect(truePairs)
    val r1 = found(1).size.toDouble / truePairs.size
    val r8 = found(8).size.toDouble / truePairs.size
    info(f"planted-dup pair recall (${truePairs.size} true pairs): 1 table $r1%.2f, 8 tables $r8%.2f")
    assert(r8 >= 0.85, f"amplified detector missed planted dups: $r8%.2f < 0.85")
    assert(r8 > r1, "amplification must improve pair recall")

    // lshKnnJoin on the same planted fixture: each twin's TRUE nearest
    // neighbor is its partner (cos ≈ 0.9 vs ≤ ~0.5 for everything else),
    // so the kNN join must put the partner at rank 1 whenever any of its
    // tables co-buckets the pair — the same amplification economics as
    // the pair detector, measured in the rank-1 position a retrieval
    // user consumes
    val knn = Ann.lshKnnJoin(rows, "embedding", "vec_id", dim = dim,
        k = 1, nPlanes = 8, nTables = 8)
      .select($"id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val rank1Hits = truePairs.count { case (a, b) =>
      knn.get(a).contains(b) && knn.get(b).contains(a)
    }
    val rKnn = rank1Hits.toDouble / truePairs.size
    info(f"kNN-join rank-1 partner recall: $rKnn%.2f")
    assert(rKnn >= 0.85, f"kNN join missed planted partners at rank 1: $rKnn%.2f < 0.85")
  }

  test("ivfTopK recall improves with nProbe (the knob a user turns)") {
    val k = 5
    val queryIds = (0L until 8L).toSeq
    val centroids = Ann.firstKCentroids(emb, "embedding", "vec_id", k = 8)
    val exact = exactTopK(queryIds, k)
    def at(nProbe: Int): Double = {
      val got = Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), "embedding", "vec_id",
          centroids, k = k, nProbe = nProbe)
        .select($"query_id", $"corpus_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      recall(got, exact, k)
    }
    val r2 = at(2); val r8 = at(8)
    info(f"IVF recall@5: nProbe=2 → $r2%.3f, nProbe=8 (all cells) → $r8%.3f")
    // probing every cell IS exhaustive search — recall must be 1.0
    assert(r8 === 1.0, f"nProbe=all must be exact, got $r8%.3f")
    assert(r8 >= r2, "recall must be monotone in nProbe")
  }
}
