package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkTestBase

class AhoCorasickSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def counts(text: String, pats: String*): Seq[Long] =
    new AcAutomaton(pats).countHits(UTF8String.fromString(text)).toSeq

  test("all-occurrence counts: nested and overlapping patterns all fire") {
    // seashells: "she" at 0 and 3(+a? no: s-e-a-s-h-e) — "she sells seashells"
    //   she: "she"(0) + "seashells" idx 3 "she" → 2
    //   he:  inside both "she"s → 2
    //   hells: tail of seashells → 1
    //   ells: "sells" + "seashells" → 2
    assert(counts("she sells seashells", "she", "he", "hells", "ells")
      === Seq(2L, 2L, 1L, 2L))
    // self-overlap: AC counts every end position; replace-count would say 2
    assert(counts("aaaa", "aa") === Seq(3L))
    // disjoint + absent
    assert(counts("abcabc", "abc", "zzz") === Seq(2L, 0L))
    // multi-byte UTF-8 pattern, byte-wise
    assert(counts("café caffé café", "café") === Seq(2L))
  }

  test("anyHit early-exit screen agrees with countHits") {
    val ac = new AcAutomaton(Seq("spark", "scan"))
    assert(ac.anyHit(UTF8String.fromString("a full table scan")))
    assert(!ac.anyHit(UTF8String.fromString("nothing to see")))
    assert(!ac.anyHit(UTF8String.fromString("")))
  }

  test("automaton parity with naive regex counting on real document text") {
    val pats = Seq("scan", "can", "merge", "bat", "spark", "row")
    val ac = new AcAutomaton(pats)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").as[String].take(300)
    docs.foreach { t =>
      val got = ac.countHits(UTF8String.fromString(t)).toSeq
      val want = pats.map { p =>
        // all-occurrence count: try every start position
        (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
      }
      assert(got === want, s"doc: ${t.take(80)}")
    }
  }

  test("hasProperBorder flags exactly the patterns the replace-count oracle would undercount") {
    assert(AcAutomaton.hasProperBorder("aa"))
    assert(AcAutomaton.hasProperBorder("abab"))
    assert(AcAutomaton.hasProperBorder("abcab"))
    assert(!AcAutomaton.hasProperBorder("scan"))
    assert(!AcAutomaton.hasProperBorder("batch"))
    assert(!AcAutomaton.hasProperBorder("a"))
  }

  test("l107 registry pattern set is border-free — the replace-count oracle is exact for it") {
    val pats = Seq("scan", "can", "merge", "bat", "spark", "row")
    assert(pats.forall(p => !AcAutomaton.hasProperBorder(p)))
  }

  test("guards: empty pattern set and empty pattern refused; null text propagates") {
    intercept[IllegalArgumentException](new AcAutomaton(Seq.empty))
    intercept[IllegalArgumentException](new AcAutomaton(Seq("ok", "")))
    AhoCorasick.register(spark, Seq("x"))
    val r = spark.sql("SELECT graft_ac_counts(CAST(NULL AS STRING)) c").collect()(0)
    assert(r.isNullAt(0))
  }

  test("blocklistHits: one row per hit pattern, counts exact, misses absent") {
    val df = Seq((1L, "the scan can scan"), (2L, "no match here"), (3L, "bat batch"))
      .toDF("doc_id", "text")
    val out = AhoCorasick.blocklistHits(spark, df, "doc_id", "text",
      Seq("scan", "can", "bat", "zzz"))
    val got = out.as[(Long, String, Long)].collect().toSet
    // "the scan can scan": scan 2; can 3 (inside both scans + standalone)
    // "bat batch": bat 2 (standalone + prefix of batch)
    assert(got === Set((1L, "scan", 2L), (1L, "can", 3L), (3L, "bat", 2L)))
  }

  test("whole-stage codegen handles the reference-object automaton") {
    val df = spark.range(2000).select(
      concat(lit("padding spark scan text "), col("id").cast("string")).as("t"))
    AhoCorasick.register(spark, Seq("spark", "scan", "park"))
    val total = df.select(call_function("graft_ac_counts", col("t")).as("c"))
      .select(aggregate(col("c"), lit(0L), (a, x) => a + x).as("s"))
      .agg(sum("s")).as[Long].head()
    assert(total === 3L * 2000)
  }
}
