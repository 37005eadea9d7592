package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("vocabGrowth: planted first-seen buckets, cumulative total = vocabulary") {
    // ids 0..3, 2 buckets: bucket 0 = ids {0,1}, bucket 1 = ids {2,3}
    val docs = Seq(
      0L -> "a b",      // a,b first seen in bucket 0
      1L -> "b c",      // c new in bucket 0
      2L -> "a d",      // d new in bucket 1
      3L -> "e e b").toDF("doc_id", "text")
    val rows = CorpusStats.vocabGrowth(docs, "doc_id", TextOps.whitespaceTokens(col("text")), nBuckets = 2)
      .orderBy("bucket")
      .select("bucket", "new_types", "new_type_docfreq", "cum_types")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // dfs: a=2 docs, b=3, c=1 (bucket 0: 2+3+1=6); d=1, e=1 (bucket 1: 2)
    assert(rows == Seq((0L, 3L, 6L, 3L), (1L, 2L, 2L, 5L)))
    assert(rows.last._4 == 5L, "cumulative = |{a,b,c,d,e}|")
  }

  test("vocabGrowth: sparse ids bucket over the id RANGE, not rank") {
    // max id 19 -> n_ids 20, 10 buckets of width 2: id 0 -> bucket 0, id 19 -> bucket 9
    val docs = Seq(0L -> "x", 19L -> "y").toDF("doc_id", "text")
    val m = CorpusStats.vocabGrowth(docs, "doc_id", TextOps.whitespaceTokens(col("text")), nBuckets = 10)
      .select("bucket", "new_types").as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 1L, 9L -> 1L))
  }

  test("consecutiveOverlap: identical neighbors score 1, disjoint score 0, singles drop") {
    val docs = Seq(
      (1L, "A", "w x y z"),   // shingles {w x y, x y z}
      (2L, "A", "w x y z"),   // identical -> j = 1 with doc 1
      (3L, "A", "p q r s"),   // disjoint -> j = 0 with doc 2
      (4L, "B", "a b c d"),   // only doc in B with a successor...
      (5L, "B", "a b c e"),   // {a b c, b c d} vs {a b c, b c e} -> j = 1/3
      (6L, "C", "lone doc here"), // single doc -> no pair row for C? (one doc, no lag)
      (7L, "D", "x")          // too short for trigrams -> filtered
    ).toDF("doc_id", "source", "text")
    val got = CorpusStats.consecutiveOverlap(docs, "doc_id", "source", "text")
      .select("source", "n_pairs", "mean_jaccard", "n_high")
      .as[(String, Long, Double, Long)].collect()
      .map { case (s, a, b, c) => s -> ((a, b, c)) }.toMap
    assert(got("A") == ((2L, 0.5, 1L)))          // j = 1.0 and 0.0 -> mean 0.5, one high
    assert(got("B") == ((1L, 0.333333, 0L)))     // 1/3 rounded to 6 dp
    assert(!got.contains("C") && !got.contains("D"))
  }

  test("ngramNovelty: first doc fully novel, copy fully stale, shorts absent") {
    val docs = Seq(
      (1L, "a b c d"),   // bigrams (n=2): {a b, b c, c d} all first here -> novelty 1
      (2L, "a b c d"),   // exact copy -> novelty 0
      (3L, "c d e f"),   // {c d, d e, e f}: c d seen in doc 1 -> 2/3 novel
      (4L, "solo")       // 1 token < n -> absent
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(docs, "doc_id", "text", n = 2)
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((3L, 3L, 1.0)),
      2L -> ((3L, 0L, 0.0)),
      3L -> ((3L, 2L, 0.666667))))
  }

  test("lengthHistogram: exact power-of-two buckets, empties at -1") {
    val docs = Seq(
      ("s1", "a"),                  // 1 token  -> bucket 0
      ("s1", "a b"),                // 2 tokens -> bucket 1
      ("s1", "a b c"),              // 3 tokens -> bucket 1
      ("s1", "a b c d"),            // 4 tokens -> bucket 2 (boundary exact)
      ("s1", ""),                   // 0 tokens -> bucket -1
      ("s2", (1 to 8).map(_ => "t").mkString(" ")) // 8 -> bucket 3
    ).toDF("source", "text")
    val got = CorpusStats.lengthHistogram(docs, "source", "text")
      .select("source", "bucket", "n_docs", "n_tokens", "min_tokens", "max_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got == Map(
      ("s1", 0L) -> ((1L, 1L, 1L, 1L)),
      ("s1", 1L) -> ((2L, 5L, 2L, 3L)),
      ("s1", 2L) -> ((1L, 4L, 4L, 4L)),
      ("s1", -1L) -> ((1L, 0L, 0L, 0L)),
      ("s2", 3L) -> ((1L, 8L, 8L, 8L))))
  }

  test("dupSizeHistogram: exact removable weight keeps the min-id member") {
    val df = Seq(
      (1L, "k1", 10L), (2L, "k1", 30L), (3L, "k1", 20L), // size 3, keeper w=10, removable 50
      (4L, "k2", 7L), (5L, "k2", 5L),                    // size 2, keeper w=7, removable 5
      (6L, "k3", 99L)                                    // singleton, removable 0
    ).toDF("id", "key", "w")
    val got = CorpusStats.dupSizeHistogram(df, "key", "id", "w")
      .select("group_size", "n_groups", "n_redundant_docs", "removable_weight")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((3L, 1L, 2L, 50L), (2L, 1L, 1L, 5L), (1L, 1L, 0L, 0L)))
  }

  test("ngramPrecisionEval: clipping caps repeated candidate grams at the reference count") {
    val df = Seq(
      (1L, "s", "the cat the dog"),   // reference for doc 2
      (2L, "s", "the the the the"),   // cand: clipped unigram = min(4, 2) = 2 of 4
      (3L, "s", "a cat sat here"),    // vs doc 2: 'the' absent -> 0 of 4... cand=doc3 ref=doc2: none of a/cat/sat/here in ref -> 0
      (4L, "t", "x y z")              // first in its source: no pair
    ).toDF("doc_id", "source", "text")
    val got = CorpusStats.ngramPrecisionEval(df, "doc_id", "source", "text")
      .select("source", "n_pairs", "p1_num", "p1_den", "p2_num", "p2_den")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // source s: pair (2 vs 1): c1 = clip(the x4 -> 2) = 2, d1 = 4;
    //   bigrams cand = [the the x3], ref = [the cat, cat the, the dog] -> c2 = 0, d2 = 3
    // pair (3 vs 2): c1 = 0, d1 = 4; bigrams share nothing -> c2 = 0, d2 = 3
    assert(got("s") === (("s", 2L, 2L, 8L, 0L, 6L)))
    assert(!got.contains("t"), "single-doc source has no pairs")
    // identical adjacent docs score perfect precision
    val ident = Seq((1L, "u", "a b a c"), (2L, "u", "a b a c"))
      .toDF("doc_id", "source", "text")
    val p = CorpusStats.ngramPrecisionEval(ident, "doc_id", "source", "text")
      .select("p1", "p2").as[(Double, Double)].head()
    assert(p === ((1.0, 1.0)))
  }

  test("ngramPrecisionEval: blank docs are excluded, not counted as a phantom empty gram") {
    val df = Seq(
      (1L, "s", "a b c"),
      (2L, "s", "   "),    // blank: must not form a pair in either role
      (3L, "s", "a b c"),  // its reference is the BLANK doc 2 -> excluded
      (4L, "s", "a b d")   // reference doc 3 -> counted
    ).toDF("doc_id", "source", "text")
    val got = CorpusStats.ngramPrecisionEval(df, "doc_id", "source", "text")
      .select("n_pairs", "p1_num", "p1_den").as[(Long, Long, Long)].head()
    assert(got === ((1L, 2L, 3L)), "only the (4 vs 3) pair survives")
  }

  test("datasetCard: sections reconcile, dup share counts fingerprint groups") {
    val df = Seq(
      (0L, "en", "web", "alpha beta gamma"),
      (1L, "en", "web", "alpha beta gamma"), // exact dup of 0
      (2L, "en", "book", "delta epsilon"),
      (3L, "de", "web", "zeta eta theta iota")
    ).toDF("doc_id", "lang", "source", "text")
    val card = DatasetCard.datasetCard(df, "doc_id", "text", "lang", "source")
      .as[(String, String, String, Double)].collect()
    def v(sec: String, dim: String, m: String): Double =
      card.collect { case (s, d, mm, x) if s == sec && d == dim && mm == m => x }.head
    assert(v("corpus", "all", "n_docs") === 4.0)
    assert(v("corpus", "all", "n_tokens") === (3 + 3 + 2 + 4).toDouble)
    // both copies of the duplicated text count toward the dup share
    assert(v("corpus", "all", "dup_doc_share") === 0.5)
    assert(v("lang", "en", "n_docs") === 3.0 && v("lang", "de", "n_docs") === 1.0)
    assert(v("source", "web", "dup_doc_share") === round6(2.0 / 3.0))
    assert(v("source", "book", "dup_doc_share") === 0.0)
    // sections partition the corpus: lang and source doc counts both sum
    // to the corpus total, token mass reconciles across all three views
    for (sec <- Seq("lang", "source")) {
      val docs = card.collect { case (s, _, "n_docs", x) if s == sec => x }.sum
      val toks = card.collect { case (s, _, "n_tokens", x) if s == sec => x }.sum
      assert(docs === v("corpus", "all", "n_docs"), sec)
      assert(toks === v("corpus", "all", "n_tokens"), sec)
    }
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Textbook quadratic LCS — the independent reference the native
    * rolling-row expression is checked against. */
  private def naiveLcs(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
    for (i <- 1 to a.size; j <- 1 to b.size)
      dp(i)(j) =
        if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
        else math.max(dp(i - 1)(j), dp(i)(j - 1))
    dp(a.size)(b.size)
  }

  test("LcsLen matches the textbook DP on seeded random token pairs, empties included") {
    val rnd = new scala.util.Random(7)
    val fixtures = (0 until 60).map { i =>
      val vocab = Seq("a", "b", "c", "d", "e")
      def seq(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, seq(rnd.nextInt(12)), seq(rnd.nextInt(12)))
    } ++ Seq((100L, Seq.empty[String], Seq("a")), (101L, Seq("a"), Seq.empty[String]))
    val got = fixtures.toDF("id", "c", "r")
      .select(col("id"), LcsLen.lcsCol(spark, col("c"), col("r")).as("lcs"))
      .as[(Long, Int)].collect().toMap
    fixtures.foreach { case (id, c, r) =>
      assert(got(id) === naiveLcs(c, r), s"id=$id c=$c r=$r")
    }
  }

  test("rougeLBySource: closed-form adjacent pairing with truncation") {
    val docs = Seq(
      (1L, "s", "the cat sat on the mat"),
      (2L, "s", "the cat stood on a mat"),  // vs doc1: LCS(the cat,on,mat)=5? checked below
      (3L, "s", "completely different words here"),
      (10L, "t", "x y z"),
      (11L, "t", "x q z")).toDF("doc_id", "source", "text")
    val out = CorpusStats.rougeLBySource(docs, "doc_id", "source", "text", maxTokens = 40)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // source s pairs: (2 vs 1) LCS=naive, (3 vs 2) LCS=naive
    val l21 = naiveLcs("the cat stood on a mat".split(" "), "the cat sat on the mat".split(" "))
    val l32 = naiveLcs("completely different words here".split(" "), "the cat stood on a mat".split(" "))
    val (cs, rs) = (6L + 4L, 6L + 6L)
    val lcsSum = (l21 + l32).toLong
    assert(out("s")._2 === 2L && out("s")._3 === lcsSum)
    assert(out("s")._6 === round6(lcsSum.toDouble / cs))
    assert(out("s")._7 === round6(lcsSum.toDouble / rs))
    assert(out("s")._8 === round6(2.0 * lcsSum / (cs + rs)))
    // source t: one pair, LCS(x q z, x y z) = 2
    assert(out("t")._2 === 1L && out("t")._3 === 2L)
  }

  test("rougeLBySource truncates to maxTokens before the DP") {
    val docs = Seq(
      (1L, "s", (1 to 50).map(i => s"w$i").mkString(" ")),
      (2L, "s", (1 to 50).map(i => s"w$i").mkString(" "))).toDF("doc_id", "source", "text")
    val out = CorpusStats.rougeLBySource(docs, "doc_id", "source", "text", maxTokens = 8)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)].collect().head
    assert(out._3 === 8L && out._4 === 8L && out._5 === 8L, "identical docs cap at maxTokens")
    assert(out._8 === 1.0)
  }

  test("readabilityStats: hand-computed FK grade and ease in exact micro-units") {
    val docs = Seq(
      (1L, "The cat sat. It ran fast!"),
      (2L, "zzz grr. ok!"),     // vowel-less words get the min-1 syllable
      (3L, "   ")               // blank: dropped, never a div-by-zero
    ).toDF("doc_id", "text")
    val out = CorpusStats.readabilityStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: W=6 S=2 Y=6 → grade = .39·3 + 11.8·1 − 15.59 = −2.62 exactly
    assert(out(1L) === ((1L, 6L, 2L, 6L, -2620000L, 119190000L)))
    // doc 2: W=3 S=2 Y=1+2 → grade = .39·1.5 + 11.8·1 − 15.59 = −3.205
    assert(out(2L)._2 === 3L)
    assert(out(2L)._4 === 3L, "two vowel-less words add min-1 syllables")
    assert(out(2L)._5 === -3205000L)
    assert(!out.contains(3L))
  }

  test("readabilityStats: numerators survive s·w past the int64 bound (ADVICE r10)") {
    // 250k tokens of "aa." → W = S = Y = 250000, so s·w = 6.25e10 and the
    // ease numerator 206835000·s·w ≈ 1.3e19 wraps int64 — the DECIMAL(38,0)
    // widening must keep both scores exact. With W=S=Y the rationals
    // collapse: grade = (390000+11800000−15590000)·w²/w² = −3.4 exactly,
    // ease = (206835000−1015000−84600000)·w²/w² = 121.22 exactly
    val big = Array.fill(250000)("aa.").mkString(" ")
    val out = CorpusStats.readabilityStats(Seq((1L, big)).toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((1L, 250000L, 250000L, 250000L, -3400000L, 121220000L)))
  }
}
