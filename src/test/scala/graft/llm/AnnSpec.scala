package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AnnSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // deterministic 8-dim vectors: cluster A around e1, cluster B around e2
  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (2L, Array(0.8f, 0.2f, 0f, 0f, 0f, 0f, 0f, 0f)),
    (3L, Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)),
    (4L, Array(0f, 0.1f, 0.9f, 0f, 0f, 0f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine") {
    val top = Ann.bruteForceTopK(vecs, "embedding", "vec_id",
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), k = 2, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(top === Seq(1L, 2L))
  }

  test("mipsTopK ranks by inner product, not cosine, and the reduction is monotone") {
    // id 1 has HIGH cosine to the query but small norm; id 5 points away
    // in angle but its large norm wins the inner product — MIPS and
    // cosine must disagree on this fixture, and mipsTopK must side with
    // the inner product
    val df = Seq(
      (1L, Array(0.1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),   // ip 0.1, cos 1.0
      (5L, Array(3f, 4f, 0f, 0f, 0f, 0f, 0f, 0f)),     // ip 3.0, cos 0.6
      (6L, Array(1f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),     // ip 1.0
      (7L, Array(-5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))     // ip -5 (largest norm!)
    ).toDF("vec_id", "embedding")
    val q = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val got = Ann.mipsTopK(df, "embedding", "vec_id", q, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq === Seq(5L, 6L, 1L, 7L))
    assert(got.map(_._2).toSeq === Seq(3.0, 1.0, 0.1, -5.0))
    // monotone reduction: aug_cosine order == inner-product order, even
    // though raw cosine order (1,6,5,7) differs
    assert(got.sortBy(-_._3).map(_._1).toSeq === got.map(_._1).toSeq)
    // closed form: aug_cosine = ip / (‖q‖·M), M = 5 (id 7's norm), ‖q‖=1
    got.foreach { case (_, ip, ac) =>
      assert(math.abs(ac - ip / 5.0) < 1e-6, s"aug_cosine $ac vs ${ip / 5.0}")
    }
  }

  test("mipsTopK excludeId and k bound the result") {
    val top = Ann.mipsTopK(vecs, "embedding", "vec_id",
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), k = 2, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(top === Seq(1L, 2L))   // ip 0.9 then 0.8; id 0 excluded
  }

  test("LSH top-k finds same-cluster neighbors without crossJoin") {
    val res = Ann.lshTopK(vecs, vecs.filter($"vec_id" === 0L), "embedding", "vec_id",
      dim = 8, k = 2, nPlanes = 6)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val ids = res.select("corpus_id").as[Long].collect().toSet
    assert(ids.contains(1L) || ids.contains(2L))
  }

  test("native HyperplaneBucket matches the expression-composed fold (offset 0 and table slices)") {
    import org.apache.spark.sql.functions._
    for (offset <- Seq(0, 10, 30)) {
      val df = vecs.select($"vec_id", $"embedding".as("vec"),
        Ann.hyperplaneBucket($"embedding", dim = 8, nPlanes = 10, planeOffset = offset).as("fold"))
      val both = df.withColumn("native", HyperplaneBucket.bucketCol(spark, "vec", 10, offset))
        .select($"vec_id", $"native", $"fold").as[(Long, Long, Long)].collect()
      both.foreach { case (id, n, f) => assert(n === f, s"vec $id offset $offset: native=$n fold=$f") }
    }
    // different plane slices must actually be different hash functions
    val b = vecs.select(
        HyperplaneBucket.bucketCol(spark, "embedding", 10, 0).as("t0"),
        HyperplaneBucket.bucketCol(spark, "embedding", 10, 10).as("t1"))
      .as[(Long, Long)].collect()
    assert(b.exists { case (t0, t1) => t0 != t1 }, "offset slices collapsed to one function")
  }

  test("IVF top-k: probed cells recover same-cluster neighbors") {
    val centroids = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    val res = Ann.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), "embedding", "vec_id",
      centroids, k = 2, nProbe = 1)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val ids = res.select("corpus_id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L)) // same cell as the query; cluster B excluded
  }

  test("kmeansCentroids recovers planted clusters and improves on first-k seeds") {
    // first-2 seeds both land in cluster A (ids 0,1) — Lloyd must pull one
    // centroid to cluster B (ids 3,4) and converge to the cluster means
    val cents = Ann.kmeansCentroids(vecs, "embedding", "vec_id", k = 2, iters = 4)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val a = Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val b = Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    // each planted cluster axis has a near-aligned trained centroid
    assert(cents.exists(c => cos(c, a) > 0.95), cents.map(_.toSeq))
    assert(cents.exists(c => cos(c, b) > 0.95), cents.map(_.toSeq))
    // trained centroids route IVF correctly: query 0 stays in cluster A
    val res = Ann.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), "embedding", "vec_id",
      cents, k = 2, nProbe = 1)
    assert(res.select("corpus_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  // deterministic synthetic corpus for the large-k path: 60 rows, 16 dims
  private def synth(n: Int, dim: Int) = {
    val rng = new scala.util.Random(7)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }
  private def synthCentroids(k: Int, dim: Int): Seq[Array[Float]] = {
    val rng = new scala.util.Random(11)
    Seq.fill(k)(Array.fill(dim)(rng.nextFloat() - 0.5f))
  }

  test("IVF broadcast-centroid path matches the literal fold bit for bit (k=32)") {
    val corpus = synth(60, 16)
    val queries = corpus.filter($"vec_id" < 4L)
    val cents = synthCentroids(32, 16)
    def run(bc: Boolean) =
      Ann.ivfTopKPath(corpus, queries, "embedding", "vec_id", cents,
          k = 5, nProbe = 2, broadcastCentroids = bc)
        .select("query_id", "corpus_id", "cosine_sim")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(bc = true) === run(bc = false))
  }

  test("broadcast-centroid path keeps the plan flat at k=1024 and plans a hash join") {
    val corpus = synth(60, 16)
    val queries = corpus.filter($"vec_id" < 2L)
    val small = Ann.ivfTopKPath(corpus, queries, "embedding", "vec_id",
      synthCentroids(32, 16), k = 3, nProbe = 2, broadcastCentroids = false)
    val big = Ann.ivfTopKPath(corpus, queries, "embedding", "vec_id",
      synthCentroids(1024, 16), k = 3, nProbe = 2, broadcastCentroids = true)
    // 32× the centroids must NOT grow the plan: the centroid data lives in a
    // broadcast relation, not in literal expression nodes
    val sizeSmall = small.queryExecution.optimizedPlan.toString.length
    val sizeBig = big.queryExecution.optimizedPlan.toString.length
    assert(sizeBig < sizeSmall,
      s"broadcast plan ($sizeBig chars) should be smaller than the k=32 literal fold ($sizeSmall chars)")
    // the constant-key join stays a BroadcastHashJoin — a foldable key would
    // degenerate to BroadcastNestedLoopJoin and break the no-BNLJ contract
    val phys = big.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys.take(2000))
    assert(!phys.contains("BroadcastNestedLoopJoin"), phys.take(2000))
    assert(!phys.contains("CartesianProduct"), phys.take(2000))
    // and it RUNS at k=1024 (the fold path would be a plan-size hazard here)
    assert(big.count() >= 0L)
    // the public API auto-selects the broadcast path above the threshold
    val auto = Ann.ivfTopK(corpus, queries, "embedding", "vec_id",
      synthCentroids(1024, 16), k = 3, nProbe = 2)
    assert(auto.queryExecution.optimizedPlan.toString.length < sizeSmall * 2)
  }

  test("meanAssignmentCost agrees between fold and broadcast paths") {
    val corpus = synth(40, 16)
    val cents = synthCentroids(8, 16)
    val a = Ann.meanAssignmentCostPath(corpus, "embedding", cents, useBroadcast = false)
    val b = Ann.meanAssignmentCostPath(corpus, "embedding", cents, useBroadcast = true)
    // same scoring expressions on both paths ⇒ bit-identical per-row minima;
    // the final avg is a single-partition fold either way at this size
    assert(math.abs(a - b) < 1e-12, s"fold=$a broadcast=$b")
  }

  test("embedding near-dups: over-cap bucket fires dropStats counters") {
    // 4 identical vectors share one hyperplane bucket; cap 3 drops it
    val same = Seq.tabulate(4)(i =>
      (i.toLong, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val st = graft.llm.DropStats(spark, "ann_drops")
    val pairs = Ann.embeddingNearDups(same, "embedding", "vec_id",
      dim = 8, threshold = 0.5, nPlanes = 4, maxBucketSize = 3, dropStats = Some(st))
    assert(pairs.count() === 0L)
    assert(st.buckets === 1L)
    assert(st.rows === 4L)
  }

  test("embedding near-dup pairs stay within buckets") {
    val pairs = Ann.embeddingNearDups(vecs, "embedding", "vec_id",
      dim = 8, threshold = 0.9, nPlanes = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // 0-1 and 1-2 are ≥0.9 cosine; 0-3 is orthogonal and must not appear
    assert(!pairs.contains((0L, 3L)))
    assert(pairs.nonEmpty)
  }

  test("marginBitextMine: mutual top-1 pairs survive, the hub vector does not") {
    val e = Seq(
      (1L, Array(1f, 0f), 0),      // side A, aligned with 11
      (2L, Array(0f, 1f), 0),      // side A, aligned with 12
      (11L, Array(0.99f, 0.14f), 1),
      (12L, Array(0.14f, 0.99f), 1),
      (13L, Array(0.7f, 0.7f), 1)) // hub: close to everything, nobody's best
      .toDF("vec_id", "embedding", "label")
    val out = Ann.marginBitextMine(e, "embedding", "vec_id",
        org.apache.spark.sql.functions.col("label"), k = 2, minMargin = 1.0)
      .select("a_id", "b_id", "margin").as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 11L), (2L, 12L)))
    assert(out.forall(_._3 > 1.0), s"planted pairs clear the margin: ${out.toSeq}")
  }

  test("marginBitextMineLsh: candidate path recovers the exact form's planted pairs") {
    // aligned pairs are near-identical across sides (cos > 0.999, so every
    // hyperplane agrees on them in every table — retrieval is certain),
    // plus a hub vector close to everything; the candidate path must
    // reproduce the exact form's mutual-top-1 + margin output on them
    val rnd = new scala.util.Random(7)
    val base = Array.fill(16)(rnd.nextFloat() - 0.5f)
    val e = (0L until 12L).flatMap { i =>
      val v = base.zipWithIndex.map { case (x, d) =>
        x + 0.3f * math.sin(i * 2.7 + d).toFloat }
      val vb = v.map(_ + 1e-4f)
      Seq((i, v, 0), (100L + i, vb, 1))
    }.toDF("vec_id", "embedding", "label")
    val exact = Ann.marginBitextMine(e, "embedding", "vec_id",
        org.apache.spark.sql.functions.col("label"), k = 4, minMargin = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSet
    val lsh = Ann.marginBitextMineLsh(e, "embedding", "vec_id",
        org.apache.spark.sql.functions.col("label"), k = 4, minMargin = 1.0,
        nPlanes = 4, nTables = 4, maxBucketSize = 100)
      .as[(Long, Long, Double, Double)].collect().toSet
    // every aligned (i, 100+i) pair is mutual top-1 on both paths with the
    // same sim; margins may differ (the candidate top-4 mean sees fewer
    // rows), so compare ids + sims
    val exactPairs = exact.map(r => (r._1, r._2, r._3))
    val lshPairs = lsh.map(r => (r._1, r._2, r._3))
    assert(exactPairs.nonEmpty && exactPairs.forall { case (a, b, _) => b == 100L + a })
    assert(lshPairs == exactPairs,
      s"exact=${exactPairs.toSeq.sorted} lsh=${lshPairs.toSeq.sorted}")
  }

  test("hardNegativesLsh: candidate path recovers the exact form's negatives") {
    // labeled clusters of near-identical vectors (retrieval-certain: every
    // hyperplane agrees within a cluster), so the LSH path must reproduce
    // the exact form's per-query different-label top-k bit-for-bit
    val rnd = new scala.util.Random(13)
    val bases = Array.fill(3)(Array.fill(16)(rnd.nextFloat() - 0.5f))
    val e = (0L until 30L).map { i =>
      val lbl = (i % 3).toInt
      val v = bases(lbl).zipWithIndex.map { case (x, d) =>
        x + 1e-4f * ((i * 7 + d) % 5) }
      (i, v, s"lbl$lbl")
    }.toDF("vec_id", "embedding", "label")
    val queries = e.filter(org.apache.spark.sql.functions.col("vec_id") < 6)
    val exact = Ann.hardNegatives(e, queries, "embedding", "vec_id", "label", k = 3)
      .as[(Long, String, Long, String, Double, Long)].collect().toSet
    val lsh = Ann.hardNegativesLsh(e, queries, "embedding", "vec_id", "label",
        k = 3, dim = 16, nPlanes = 4, nTables = 4)
      .as[(Long, String, Long, String, Double, Long)].collect().toSet
    assert(exact.nonEmpty && lsh === exact,
      s"exact=${exact.toSeq.sorted.take(5)} lsh=${lsh.toSeq.sorted.take(5)}")
  }

  test("marginBitextMineLsh: over-cap bucket yields no pairs and fires dropStats") {
    val same = Seq.tabulate(6)(i =>
      (i.toLong, Array(1f, 0f, 0f, 0f), (i % 2))).toDF("vec_id", "embedding", "label")
    val st = graft.llm.DropStats(spark, "bitext_drops")
    val out = Ann.marginBitextMineLsh(same, "embedding", "vec_id",
      org.apache.spark.sql.functions.col("label"), k = 2, minMargin = 0.0,
      nPlanes = 3, nTables = 1, maxBucketSize = 5, dropStats = Some(st))
    assert(out.count() === 0L)
    assert(st.buckets === 1L)
    assert(st.rows === 6L)
  }

  test("matryoshkaEval: full dim is identity recall; informative prefix survives truncation") {
    import org.apache.spark.sql.functions.col
    // vectors whose FIRST 2 dims carry all the structure (the MRL training
    // premise): truncating to 2 dims preserves the ranking exactly, while
    // dims 3-4 are a constant that cannot reorder anything
    val e = (0L until 20L).map { i =>
      (i, Array((i % 5).toFloat + 1f, (i % 7).toFloat + 1f, 1f, 1f))
    }.toDF("vec_id", "embedding")
    val out = Ann.matryoshkaEval(e, "embedding", "vec_id",
        dims = Seq(4, 2), k = 3, nQueries = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(4L) === ((4L, 4L, 12L, 1000000L))) // full dim ≡ truth
    // 2-dim prefix: same relative geometry up to the constant tail — high
    // overlap (ties broken identically by the rounded-sim + id rule)
    assert(out(2L)._4 >= 500000L, s"2-dim recall ${out(2L)._4}")
  }
}
