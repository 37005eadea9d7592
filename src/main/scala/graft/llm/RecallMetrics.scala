package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The ANN quality measurements behind the CI recall gates, as a library —
 * shared by `AnnRecallSpec` (which asserts floors) and the
 * `graft.tools.RecallReport` main (which emits `bench/RECALL.json` each
 * round), so quality regressions surface in round artifacts without
 * running the test suite. Exact-replay oracles structurally cannot see a
 * recall regression — a broken bucket function still replays "correctly"
 * — so recall is measured against an EXACT top-k computed in the driver
 * from collected vectors: an independent definition sharing no code with
 * the Spark paths, using the same 6-dp-rounded-sim, id-asc tie-break as
 * the Spark rank keys so boundary ties cannot flap the measurement.
 *
 * Fixture sizes are CI-scale (500-vector parquet fixture, 120 planted
 * vectors) — the driver-side exact baseline is O(queries × corpus) and
 * exists only to measure the distributed path, never to run at scale.
 */
object RecallMetrics {

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact top-k neighbor ids per query over `all`, rounded-sim desc then
    * id asc — the identical total order the Spark rank keys use. */
  def exactTopK(all: Map[Long, Array[Double]], queryIds: Seq[Long], k: Int): Map[Long, Set[Long]] =
    queryIds.map { q =>
      val qv = all(q)
      val top = all.iterator.filter(_._1 != q)
        .map { case (id, v) => (id, BigDecimal(cos(qv, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP)) }
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      q -> top.toSet
    }.toMap

  def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]], k: Int): Double = {
    val hit = exact.iterator.map { case (q, ex) => (approx.getOrElse(q, Set.empty) & ex).size }.sum
    hit.toDouble / (exact.size * k)
  }

  /** The sf embeddings fixture as (id, vector) columns. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("embedding"))

  private def collectAll(emb: DataFrame): Map[Long, Array[Double]] = {
    import emb.sparkSession.implicits._
    emb.as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble) }.toMap
  }

  private def topKOf(df: DataFrame): Map[Long, Set[Long]] = {
    import df.sparkSession.implicits._
    df.select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
  }

  /** recall@5 of [[Ann.lshTopK]] at the registry's parameters. */
  def lshRecallAt5(spark: SparkSession, sfDir: String,
                   nPlanes: Int = 6, nTables: Int = 8): Double = {
    val emb = embeddings(spark, sfDir)
    val k = 5
    val queryIds = (0L until 16L).toSeq
    val got = topKOf(Ann.lshTopK(emb, emb.filter(col("vec_id") < 16), "embedding", "vec_id",
      dim = 64, k = k, nPlanes = nPlanes, nTables = nTables))
    recall(got, exactTopK(collectAll(emb), queryIds, k), k)
  }

  /** recall@5 of [[Ann.ivfTopK]] at the registry's 8-cell index. */
  def ivfRecallAt5(spark: SparkSession, sfDir: String, nProbe: Int = 2): Double = {
    val emb = embeddings(spark, sfDir)
    val k = 5
    val queryIds = (0L until 8L).toSeq
    val centroids = Ann.firstKCentroids(emb, "embedding", "vec_id", k = 8)
    val got = topKOf(Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), "embedding", "vec_id",
      centroids, k = k, nProbe = nProbe))
    recall(got, exactTopK(collectAll(emb), queryIds, k), k)
  }

  /** Planted high-sim fixture (deterministic hash-derived jittered twins
    * at cosine ≈ 0.88–0.93 — the regime where single-table LSH provably
    * misses most pairs and amplification earns its keep). */
  final case class Planted(rows: DataFrame, truePairs: Set[(Long, Long)])

  def plantedFixture(spark: SparkSession, n: Int = 60, dim: Int = 32): Planted = {
    import spark.implicits._
    def comp(seed: Int, d: Int): Float = {
      val h = scala.util.hashing.MurmurHash3.productHash((seed, d))
      h.toFloat / Int.MaxValue.toFloat
    }
    def vecs(i: Int): (Array[Float], Array[Float]) = {
      val base = Array.tabulate(dim)(d => comp(i, d))
      val twin = base.zipWithIndex.map { case (x, d) => x + 0.45f * comp(i + 1000, d) }
      (base, twin)
    }
    val rows = (0 until n).flatMap { i =>
      val (base, twin) = vecs(i)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, twin))
    }.toDF("vec_id", "embedding")
    def cosF(a: Array[Float], b: Array[Float]): Double =
      cos(a.map(_.toDouble), b.map(_.toDouble))
    val truePairs = (0 until n).flatMap { i =>
      val (base, twin) = vecs(i)
      if (cosF(base, twin) >= 0.9) Some((i.toLong * 2, i.toLong * 2 + 1)) else None
    }.toSet
    Planted(rows, truePairs)
  }

  /** Pair recall of [[Ann.embeddingNearDups]] on the planted fixture. */
  def plantedPairRecall(spark: SparkSession, nTables: Int, dim: Int = 32): Double = {
    import spark.implicits._
    val p = plantedFixture(spark, dim = dim)
    val found = Ann.embeddingNearDups(p.rows, "embedding", "vec_id", dim = dim,
        threshold = 0.9, nPlanes = 8, nTables = nTables)
      .select(col("id1"), col("id2")).as[(Long, Long)].collect().toSet
      .intersect(p.truePairs)
    found.size.toDouble / p.truePairs.size
  }

  /** Pair recall of the REGISTERED candidate path [[Ann.marginBitextMineLsh]]
    * against the exact all-pairs [[Ann.marginBitextMine]] on the planted
    * fixture, sides = id parity (base vs jittered twin — exactly the
    * aligned-corpus shape bitext mining targets). The l84 quality gate:
    * exact-replay oracles prove the candidate path computes what it
    * retrieves; this measures what it RETRIEVES. */
  def bitextPairRecall(spark: SparkSession, nTables: Int = 8, dim: Int = 32): Double = {
    import spark.implicits._
    val p = plantedFixture(spark, dim = dim)
    val side = col("vec_id") % 2
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    val exact = pairs(Ann.marginBitextMine(p.rows, "embedding", "vec_id",
      side, k = 4, minMargin = 1.0))
    val lsh = pairs(Ann.marginBitextMineLsh(p.rows, "embedding", "vec_id",
      side, k = 4, minMargin = 1.0, nPlanes = 8, nTables = nTables))
    lsh.intersect(exact).size.toDouble / exact.size
  }

  /** Rank-1 partner recall of [[Ann.lshKnnJoin]] on the planted fixture. */
  def knnRank1Recall(spark: SparkSession, dim: Int = 32): Double = {
    import spark.implicits._
    val p = plantedFixture(spark, dim = dim)
    val knn = Ann.lshKnnJoin(p.rows, "embedding", "vec_id", dim = dim,
        k = 1, nPlanes = 8, nTables = 8)
      .select(col("id"), col("neighbor_id")).as[(Long, Long)].collect().toMap
    val hits = p.truePairs.count { case (a, b) =>
      knn.get(a).contains(b) && knn.get(b).contains(a)
    }
    hits.toDouble / p.truePairs.size
  }
}
