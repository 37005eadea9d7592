package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  private def docs = Seq(
    (0L, base),
    (1L, base),                                     // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),           // near dup of 0
    (3L, "completely different content about spark catalyst optimizer rules engine"),
    (4L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
      .select("keep_id", "dup_cnt").as[(Long, Long)].collect().toMap
    assert(out(0L) === 2L)       // docs 0+1 collapse, min id kept
    assert(out.values.sum === 5L)
  }

  test("dedupKeepFirst keeps one row per exact-dup group") {
    val kept = Dedup.dedupKeepFirst(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 2L, 3L, 4L)) // doc 1 (dup of 0) dropped
  }

  test("lineDedup removes cross-doc boilerplate lines, keeps blanks and local repeats") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal content one\n\nreal content one"),  // intra-doc repeat stays
      (2L, "COOKIE BANNER\nunique middle\nother text"),
      (3L, "COOKIE BANNER\nthird doc body"),
      (4L, "no boilerplate here\n\ntrailing blank\n"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDf = 3)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, nl, nr) => id -> ((t, nl, nr)) }.toMap
    // banner in 3 distinct docs → removed everywhere; blank + repeat kept
    assert(got(1L) === (("real content one\n\nreal content one", 4L, 1L)))
    assert(got(2L) === (("unique middle\nother text", 3L, 1L)))
    assert(got(3L) === (("third doc body", 2L, 1L)))
    // trailing \n → trailing empty line survives intact
    assert(got(4L) === (("no boilerplate here\n\ntrailing blank\n", 4L, 0L)))
    assert(!got.contains(5L)) // null text filtered, mirrored in the oracle
  }

  test("lineDedup: doc reduced to nothing comes back as empty text, not a dropped row") {
    val docs = Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME"))
      .toDF("doc_id", "text")
    val got = Dedup.lineDedup(docs, "doc_id", "text", minDf = 3)
      .as[(Long, String, Long, Long)].collect()
    assert(got.length === 3)
    got.foreach { case (_, t, nl, nr) => assert(t === "" && nl === 1L && nr === 1L) }
  }

  test("lineDedup plans the heavy-line set as a broadcast anti-join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.lineDedup(docs, "doc_id", "text", minDf = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("repeatedSpanScrub removes cross-doc verbatim spans, keeps unique and intra-doc text") {
    val span = "the quick brown fox jumps over the lazy" // 8 tokens
    val docs = Seq(
      (1L, s"intro one $span outro one"),
      (2L, s"different lead $span and a tail"),
      (3L, "totally unique content with no repeats at all whatsoever here"),
      (4L, s"short doc"),                    // < n tokens, untouched
      (5L, s"$span $span"))                  // intra-doc... also cross-doc here
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpanScrub(docs, "doc_id", "text", n = 8, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, nt, nr) => id -> ((t, nt, nr)) }.toMap
    assert(got(1L) === (("intro one outro one", 12L, 8L)))
    assert(got(2L) === (("different lead and a tail", 13L, 8L)))
    assert(got(3L)._3 === 0L) // unique doc untouched
    assert(got(3L)._1.startsWith("totally unique"))
    assert(got(4L) === (("short doc", 2L, 0L)))
    // doc 5 is all span (plus bridging 8-grams also cross nothing): every
    // token covered by the cross-doc shingle -> scrubbed to empty
    assert(got(5L)._1 === "" && got(5L)._3 === 16L)
  }

  test("repeatedSpanScrub: intra-doc-only repetition does not trigger removal") {
    val span = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"$span filler $span"), // repeats only within ONE doc
      (2L, "completely unrelated second document content here okay"))
      .toDF("doc_id", "text")
    val got = Dedup.repeatedSpanScrub(docs, "doc_id", "text", n = 8, minDf = 2)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, _, nr) => id -> ((t, nr)) }.toMap
    assert(got(1L)._2 === 0L, s"intra-doc repeat wrongly scrubbed: ${got(1L)}")
    assert(got(2L)._2 === 0L)
  }

  test("minhash LSH finds planted near-dups, not unrelated pairs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id", shingleSize = 3, k = 32, bands = 16)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.contains((3L, 4L)))
  }

  test("LSH plan contains no cartesian/crossJoin") {
    val plan = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("short and empty docs flow through the LSH pipeline without error or bogus pairs") {
    val shorts = Seq((10L, ""), (11L, "one"), (12L, "one two"), (13L, "uno dos")).toDF("doc_id", "text")
    val all = docs.unionByName(shorts)
    val pairs = Dedup.minhashCandidatePairs(all, "text", "doc_id", shingleSize = 3, k = 32, bands = 16)
      .as[(Long, Long)].collect().toSet
    // shingle-less docs (< 3 tokens) must not pair with anything — before the
    // guard they all shared a null signature and formed one giant bogus bucket
    val shortIds = Set(10L, 11L, 12L, 13L)
    assert(pairs.forall { case (a, b) => !shortIds(a) && !shortIds(b) })
    assert(pairs.contains((0L, 1L))) // real dups still found
    // nearDupPairs (jaccard verify) also survives short docs
    val nd = Dedup.nearDupPairs(all, "text", "doc_id", threshold = 0.3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)))
    // inline signature form no longer throws on short docs
    val sig = shorts.select(Dedup.minhashSignature($"text", 3, 8).as("s"))
    assert(sig.collect().length === 4)
  }

  test("jaccard verification scores exact overlap") {
    val withJ = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    val m = withJ.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((0L, 1L)) === 1.0)                 // identical → jaccard 1
    assert(m.get((0L, 2L)).exists(j => j > 0.3 && j < 1.0))
  }

  test("xx-family LSH recall vs exact-Jaccard ground truth at sf0.001") {
    // ground truth: ALL pairs with shingle-Jaccard >= 0.5 (crossJoin is
    // fine at test scale; the operators themselves never do this)
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = corpus.select(col("doc_id").as("sid"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val exact = sh.select(col("sid").as("id1"), col("sh").as("sh1"))
      .crossJoin(sh.select(col("sid").as("id2"), col("sh").as("sh2")))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Dedup.jaccard(col("sh1"), col("sh2")).as("j"))
      .filter(col("j") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain true near-dup pairs")
    // k=32, bands=16 (rows=2): per-pair miss prob at s=0.5 is 0.75^16 ≈ 1%
    for (fam <- Seq(Xx64Family, PortableFamily)) {
      val cands = Dedup.minhashCandidatePairs(corpus, "text", "doc_id",
          shingleSize = 3, k = 32, bands = 16, family = fam)
        .as[(Long, Long)].collect().toSet
      val recall = exact.count(cands).toDouble / exact.size
      assert(recall >= 0.9, s"$fam recall $recall over ${exact.size} true pairs")
    }
  }

  test("portable and xx families agree on verified near-dup pairs") {
    // jaccard is computed over distinct shingle hashes — its VALUE is
    // hash-family-independent (absent collisions), so pairs surviving both
    // families' candidate stages must carry identical scores
    val xx = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val portable = Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.3,
        family = PortableFamily)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(portable.contains((0L, 1L)) && xx.contains((0L, 1L)))
    for ((pair, j) <- portable if xx.contains(pair))
      assert(xx(pair) === j, s"pair $pair: xx=${xx(pair)} portable=$j")
  }

  test("over-cap buckets fire dropStats counters instead of vanishing silently") {
    // 5 identical docs, cap 3: every band's bucket holds all 5 → all dropped.
    // Accumulator-based (NOT df.observe): the bucket agg sits in a non-final
    // AQE query stage here (distinct() shuffles above it), exactly the shape
    // where CollectMetrics loses its values — see DropStats scaladoc.
    val dups = Seq.tabulate(5)(i => (i.toLong, base)).toDF("doc_id", "text")
    val st = DropStats(spark, "lsh_drops")
    val pairs = Dedup.minhashCandidatePairs(dups, "text", "doc_id",
      shingleSize = 3, k = 32, bands = 16, maxBucketSize = 3, dropStats = Some(st))
    assert(pairs.count() === 0L) // every bucket over cap → no pairs emitted
    assert(st.buckets === 16L)   // one over-cap bucket per band
    assert(st.rows === 80L)      // 16 buckets × 5 members
  }

  test("nearDupDetectBatch: keep-first by (ts, id), id breaks ts ties") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // 1 and 2 share buckets and a TIMESTAMP: lower id keeps; 3 is later
    val docs = Seq(
      (2L, 100L, base), (1L, 100L, base + " x"), (3L, 200L, base + " y"),
      (9L, 50L, "completely different content about spark catalyst internals"))
      .toDF("doc_id", "t", "text")
      .select($"doc_id", timestamp_seconds($"t").as("ts"), $"text")
    val dups = Dedup.nearDupDetectBatch(docs, "text", "doc_id", "ts",
      shingleSize = 3, k = 32, bands = 16)
      .as[(Long, Long)].collect().toMap
    assert(dups === Map(2L -> 1L, 3L -> 1L), dups)
  }

  test("near-dup clustering: label propagation finds min-id components") {
    // chain 1-2-3, pair 5-6, singleton 9 absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val clusters = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("native SimHash64 expression matches the HOF-fold definition") {
    val df = docs.select($"doc_id",
      TextOps.whitespaceTokens(lower($"text")).as("_toks"),
      Dedup.simhash64($"text").as("fold"))
    val both = df.select($"doc_id", SimHash64.simhashCol(spark, "_toks").as("native"), $"fold")
      .as[(Long, Long, Long)].collect()
    both.foreach { case (id, native, fold) =>
      assert(native === fold, s"doc $id: native=$native fold=$fold")
    }
    // interpreted eval path agrees too
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("the", "quick", "the").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    assert(SimHash64.compute(toks) !== 0L)
  }

  test("SimHashPortable60 hash60 matches the portableHash60 Column expression") {
    // the native expression's md5-nibble parse must equal
    // conv(substring(md5(s),1,15),16,10) — one mis-shifted nibble and the
    // DuckDB twin silently diverges
    val words = Seq("the", "quick", "brown", "", "ümlaut", "a b", "42")
    val expected = words.toDF("w")
      .select(TextOps.portableHash60($"w").as("h")).as[Long].collect()
    words.zip(expected).foreach { case (w, e) =>
      val got = SimHashPortable60.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          Array(org.apache.spark.unsafe.types.UTF8String.fromString(w))))
      // a single token's simhash IS its hash60 restricted to set bits: every
      // bit of h votes +1, every unset bit votes −1 → out == h
      assert(got === e, s"token '$w': native=$got expr=$e")
    }
    // portable near-dups still find the planted identical pair (0,1)
    val pairs = Dedup.simhashNearDupsPortable(docs, "text", "doc_id",
      maxHamming = 8, blocks = 8)
      .select($"id1", $"id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("incrementalDedup: exact beats near, bucket near-dups, unique passes") {
    val corpus = Seq(
      (10L, base),
      (11L, "another corpus document about distributed joins and shuffles today"),
      (12L, base) // later exact copy — keeper for base must be min id 10
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                                    // exact dup of 10
      (101L, base.replace("lazy", "sleepy")),          // near dup of 10
      (102L, "fresh unrelated text about streaming watermarks and state stores"),
      (103L, "tiny")                                   // < shingleSize tokens: no bands
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(batch, corpus, "text", "doc_id")
      .as[(Long, String, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(out.size === 4) // one verdict per new doc, including the tiny one
    assert(out(100L) === ((100L, "exact_dup", Some(10L)))) // exact wins, min keeper
    assert(out(101L) === ((101L, "near_dup", Some(10L))))
    assert(out(102L)._2 === "unique" && out(102L)._3.isEmpty)
    assert(out(103L)._2 === "unique")
    // verdicts are insensitive to corpus arrival order
    val shuffled = Dedup.incrementalDedup(batch, corpus.orderBy(rand(7)), "text", "doc_id")
      .as[(Long, String, Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(shuffled === out)
  }

  test("splitLeakage: cross-split near-dups surface; same-side pairs don't") {
    val seed = "sp1"
    def bucketOf(id: Long): Long = {
      val h = SimHashPortable60.hash60(
        (seed + Sampling.SeedSep + id.toString).getBytes("UTF-8"))
      java.lang.Math.floorMod(h, 100L)
    }
    // probe the deterministic split for ids on each side
    val ids = (0L until 400L)
    val train = ids.filter(bucketOf(_) < 90)
    val test = ids.filter(bucketOf(_) >= 95)
    assert(train.size >= 3 && test.size >= 2, s"probe failed: ${train.size}/${test.size}")
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "completely different content about spark catalyst optimizer rules engine"
    val docs = Seq(
      (train(0), a), (test(0), a + " ok"),   // cross-split near-dup → leaked
      (train(1), b), (train(2), b + " ok"),  // train-train near-dup → silent
      (test(1), "unrelated streaming watermark state store text here")
    ).toDF("doc_id", "text")
    val out = Dedup.splitLeakage(docs, "text", "doc_id", seed,
        trainPct = 90, valPct = 5)
      .as[(Long, Long)].collect().toSet
    assert(out === Set((test(0), train(0))), s"got $out")
  }

  test("keep-best dedup: highest merit wins, ties to min id, singletons pass through") {
    val rows = Seq(
      (5L, "aaa", 10L), (1L, "aaa", 30L), (2L, "aaa", 30L), // 1 wins: merit 30, tie → min id
      (3L, "bbb", 5L),                                      // singleton
      (4L, "ccc", 0L), (0L, "ccc", 0L)                      // zero merit ok; min id wins
    ).toDF("doc_id", "text", "merit")
    val out = Dedup.exactDedupKeepBest(rows, "text", "doc_id", "merit")
      .select("keep_id", "keep_merit", "dup_cnt")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 30L, 3L), (3L, 5L, 1L), (0L, 0L, 2L)))
  }

  test("keep-best dedup: out-of-range merit fails loudly") {
    val bad = Seq((1L, "x", Dedup.KeepBestMeritCap)).toDF("doc_id", "text", "merit")
    val e = intercept[Exception] {
      Dedup.exactDedupKeepBest(bad, "text", "doc_id", "merit").collect()
    }
    assert(e.getMessage.contains("exactDedupKeepBest") ||
      Option(e.getCause).exists(_.getMessage.contains("exactDedupKeepBest")))
  }

  test("simhash: identical docs distance 0, near-dups close, others far") {
    val sims = docs.select($"doc_id", Dedup.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sims(0L) === sims(1L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(0L), sims(2L)) < ham(sims(0L), sims(3L)))
    val nd = Dedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)))
  }

  test("OPH signature: bin mins and rotation densification match hand computation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val C = OphMinHash.C
    // k=4 over hashes {9, 14, 22}: bins 9%4=1, 14%4=2, 22%4=2 (min 14);
    // bin 0 borrows bin 1 at distance 1, bin 3 borrows bin 1 at distance 2
    val got = OphMinHash.compute(new GenericArrayData(Array[Long](9, 14, 22)), 4)
      .toLongArray().toSeq
    assert(got === Seq(9 + C, 9, 14, 9 + 2 * C))
    // negative hashes are masked to 60 bits first (xx-family inputs):
    // m = 2^60-1 lands in bin 3; bins 0..2 borrow it at distances 3, 2, 1
    val neg = OphMinHash.compute(new GenericArrayData(Array[Long](-1L)), 4)
      .toLongArray().toSeq
    val m = -1L & OphMinHash.Mask60
    assert(neg === Seq(m + 3 * C, m + 2 * C, m + C, m))
    // empty input → empty array (the column wrapper nulls it)
    assert(OphMinHash.compute(new GenericArrayData(Array.emptyLongArray), 4)
      .numElements() === 0)
  }

  test("OPH candidate pairs find planted near-dups; short docs never pair") {
    val shorts = Seq((10L, ""), (11L, "one"), (12L, "one two")).toDF("doc_id", "text")
    val all = docs.unionByName(shorts)
    for (fam <- Seq(Xx64Family, PortableFamily)) {
      val pairs = Dedup.ophCandidatePairs(all, "text", "doc_id",
          shingleSize = 3, k = 32, bands = 16, family = fam)
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((0L, 1L)), s"$fam missed the planted dup")
      assert(!pairs.contains((3L, 4L)), s"$fam paired unrelated docs")
      assert(pairs.forall { case (a, b) => a < 10L && b < 10L }, s"$fam short-doc pair")
    }
  }

  test("OPH recall vs exact-Jaccard ground truth at sf0.001") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sh = corpus.select(col("doc_id").as("sid"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    val exact = sh.select(col("sid").as("id1"), col("sh").as("sh1"))
      .crossJoin(sh.select(col("sid").as("id2"), col("sh").as("sh2")))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Dedup.jaccard(col("sh1"), col("sh2")).as("j"))
      .filter(col("j") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must contain true near-dup pairs")
    val cands = Dedup.ophCandidatePairs(corpus, "text", "doc_id",
        shingleSize = 3, k = 32, bands = 16, family = Xx64Family)
      .as[(Long, Long)].collect().toSet
    val recall = exact.count(cands).toDouble / exact.size
    assert(recall >= 0.9, s"OPH recall $recall over ${exact.size} true pairs")
  }

  test("OPH plan contains no cartesian/crossJoin") {
    // (codegen of the signature stage is gated in CodegenGateSpec)
    val plan = Dedup.ophCandidatePairs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
