package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.JoinOps

/**
 * Skewed-fixture stress for the dedup/join skew caps — the 100 TB failure
 * mode a web corpus WILL hit: one boilerplate mega-cluster (identical
 * cookie banners, license headers) landing every member in the same LSH /
 * SimHash bucket. The caps (`maxBucketSize`) are the correctness
 * mechanism; [[DropStats]] is the telemetry. This spec proves, on a
 * fixture where ONE bucket holds ~50% of all docs, that
 *  (a) candidate-pair counts stay bounded by the cap (no O(n²) pair
 *      explosion from the mega-bucket),
 *  (b) the drop telemetry reports exactly what the cap discarded, and
 *  (c) recall on planted near-dup pairs OUTSIDE the mega-bucket is
 *      identical with and without the cap — capping the pathological
 *      bucket costs nothing elsewhere.
 */
class DedupSkewSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val megaN = 400
  private val nPlanted = 20
  private val boilerplate =
    "accept all cookies to continue this site uses cookies for analytics and personalization"

  /** ~50% of docs are byte-identical boilerplate (ids 0..399 — ONE LSH
    * bucket per band); 20 planted near-dup pairs (ids 1000+2i / 1000+2i+1,
    * twin = base plus one trailing token → shingle Jaccard 18/19); the
    * rest unique filler. */
  private lazy val skewed = {
    val mega = (0 until megaN).map(i => (i.toLong, boilerplate))
    val planted = (0 until nPlanted).flatMap { i =>
      val base = (0 until 20).map(t => s"w${i}x$t").mkString(" ")
      Seq((1000L + 2 * i, base), (1001L + 2 * i, base + s" extra$i"))
    }
    val filler = (0 until 300).map(i =>
      (2000L + i, (0 until 15).map(t => s"f${i}u$t").mkString(" ")))
    (mega ++ planted ++ filler).toDF("doc_id", "text")
  }

  private val plantedPairs: Set[(Long, Long)] =
    (0 until nPlanted).map(i => (1000L + 2 * i, 1001L + 2 * i)).toSet

  private def plantedIn(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id1", "id2").as[(Long, Long)].collect().toSet
      .intersect(plantedPairs)

  test("LSH cap binds on a 50% mega-bucket: pairs bounded, telemetry exact, outside recall unaffected") {
    val cap = 50
    val bands = 8
    val stats = DropStats(spark, "skewspec")
    val capped = Dedup.minhashCandidatePairs(skewed, "text", "doc_id",
      shingleSize = 3, k = 32, bands = bands, maxBucketSize = cap,
      dropStats = Some(stats))
    val cappedPairs = capped.select("id1", "id2").as[(Long, Long)].collect() // ONE action
    // (a) no pair from the mega-cluster (all its ids < 1000), and the total
    // stays near the planted count instead of C(400,2) = 79 800
    assert(!cappedPairs.exists { case (a, b) => a < 1000 && b < 1000 },
      "capped run must not emit mega-bucket pairs")
    assert(cappedPairs.length <= 100,
      s"pair count ${cappedPairs.length} suggests an uncapped explosion")
    // (b) identical docs → identical signature → ONE over-cap bucket per
    // band, each holding all 400 members; read after exactly one action
    assert(stats.buckets === bands.toLong)
    assert(stats.rows === bands.toLong * megaN)
    // (c) every planted pair found despite the cap
    assert(cappedPairs.toSet.intersect(plantedPairs) === plantedPairs)
  }

  test("LSH recall outside the mega-bucket is IDENTICAL capped vs uncapped") {
    val capped = Dedup.minhashCandidatePairs(skewed, "text", "doc_id",
      maxBucketSize = 50)
    val uncapped = Dedup.minhashCandidatePairs(skewed, "text", "doc_id",
      maxBucketSize = 1000000)
    // the uncapped run pays the mega-bucket explosion...
    assert(uncapped.count() >= megaN.toLong * (megaN - 1) / 2)
    // ...but outside the mega-bucket both runs retrieve the same pairs
    assert(plantedIn(capped) === plantedIn(uncapped))
    assert(plantedIn(capped) === plantedPairs)
  }

  test("SimHash block cap binds on the same fixture with exact telemetry") {
    val blocks = 4
    val stats = DropStats(spark, "skewspec-simhash")
    val pairs = Dedup.simhashNearDups(skewed, "text", "doc_id",
      maxHamming = 3, blocks = blocks, maxBucketSize = 50,
      dropStats = Some(stats))
    val got = pairs.select("id1", "id2").as[(Long, Long)].collect() // ONE action
    assert(!got.exists { case (a, b) => a < 1000 && b < 1000 })
    // identical 64-bit fingerprints → one over-cap bucket per block slice
    assert(stats.buckets === blocks.toLong)
    assert(stats.rows === blocks.toLong * megaN)
  }

  test("saltedJoin: hot key spreads across salt buckets and result matches the plain join") {
    val buckets = 8
    // 50% of the big side is ONE key — the straggler-task shape
    val big = ((0 until 2000).map(i => (if (i < 1000) "HOT" else s"k${i % 37}", i.toLong)))
      .toDF("key", "payload")
    val small = Seq(("HOT", "hotdim"), ("k3", "d3"), ("k11", "d11"))
      .toDF("key", "dim")
    val salted = JoinOps.saltedJoin(big, small, "key", buckets)
    val plain = big.join(small, Seq("key"))
    assert(salted.count() === plain.count())
    assert(salted.select("key", "payload", "dim").as[(String, Long, String)].collect().toSet
      === plain.select("key", "payload", "dim").as[(String, Long, String)].collect().toSet)
    // the hot key's rows really spread: the salt is a hash of the FULL row,
    // so 1000 distinct payloads cover (nearly) all `buckets` salt values —
    // the hot key runs as ~buckets tasks instead of one straggler
    val hotSalts = big.filter(col("key") === "HOT")
      .select(pmod(xxhash64(col("key"), col("payload")), lit(buckets.toLong)))
      .distinct().count()
    assert(hotSalts === buckets.toLong)
  }
}
