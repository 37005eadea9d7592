package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("encodeWord: greedy lowest-rank single-occurrence merges (hand-computed vectors)") {
    val t = new BpeTable(Seq(("a", "b"), ("ab", "c"), ("l", "o"), ("lo", "w"),
      ("e", "r"), ("low", "er")))
    // abcabd: (a,b)@0 → [ab,c,a,b,d]; (a,b)@2 → [ab,c,ab,d]; (ab,c)@0 →
    // [abc,ab,d]; no pair left
    assert(t.encodeWord("abcabd").toSeq === Seq("abc", "ab", "d"))
    // full chain to a single token
    assert(t.encodeWord("lower").toSeq === Seq("lower"))
    // partial: (low) merges, (er) blocked by 's'
    assert(t.encodeWord("lowest").toSeq === Seq("low", "e", "s", "t"))
    assert(t.encodeWord("").toSeq === Seq.empty)
    assert(t.encodeWord("x").toSeq === Seq("x"))
  }

  test("countTokens: space-only trim + whitespace split, empty→0, per-word sums") {
    val t = new BpeTable(Seq(("a", "b")))
    assert(t.countTokens("") === 0L)
    assert(t.countTokens("   ") === 0L)
    assert(t.countTokens("ab ab cd") === 1L + 1L + 2L)
    // \t and \n are NOT trimmed (Spark/DuckDB trim is space-only) but ARE
    // split points; the leading empty token contributes 0
    assert(t.countTokens("\tab") === 0L + 1L)
  }

  test("code-point symbols: non-BMP chars are single symbols, never split surrogates") {
    val t = new BpeTable(Seq(("😀", "😀"), ("a", "😀")))
    // U+1F600 is 2 UTF-16 chars; a char-based split would break the pair
    assert(t.encodeWord("😀😀").toSeq === Seq("😀😀"))
    assert(t.encodeWord("a😀b").toSeq === Seq("a😀", "b"))
    assert(t.countTokens("héllo wörld 😀😀") ===
      t.countWord("héllo") + t.countWord("wörld") + 1L)
  }

  test("counts are additive under whitespace concatenation (pre-tokenization invariant)") {
    val t = Bpe.defaultTable
    val text = Gen.listOf(word).map(_.mkString(" "))
    samples(Gen.zip(text, text), 200).foreach { case (a, b) =>
      assert(t.countTokens(a + " " + b) === t.countTokens(a) + t.countTokens(b),
        s"not additive for '$a' + '$b'")
    }
  }

  test("count bounds: words ≤ count ≤ code points (non-space inputs)") {
    val t = Bpe.defaultTable
    samples(Gen.nonEmptyListOf(word), 200).foreach { ws =>
      val text = ws.mkString(" ")
      val n = t.countTokens(text)
      assert(n >= ws.length.toLong)
      assert(n <= ws.map(_.length.toLong).sum)
    }
  }

  test("trainLocal: deterministic, frequency-then-lexicographic tie-break, freq-1 cutoff") {
    // 'ab' appears 3×, 'cd' 2× — (a,b) first, then (c,d); the unique pairs
    // of 'xy' never repeat → no merge for them
    val freq = Seq(("ab", 3L), ("cd", 2L), ("xy", 1L))
    val merges = Bpe.trainLocal(freq, numMerges = 10)
    assert(merges === Seq(("a", "b"), ("c", "d")))
    // exact tie on count → lexicographically smallest pair wins
    val tied = Bpe.trainLocal(Seq(("zw", 2L), ("ab", 2L)), numMerges = 1)
    assert(tied === Seq(("a", "b")))
    // determinism across runs
    assert(Bpe.trainLocalFromTexts(Bpe.SeedCorpus, 64) ===
      Bpe.trainLocalFromTexts(Bpe.SeedCorpus, 64))
  }

  test("DefaultMerges: fixed size, produces real compression on the fixture register") {
    assert(Bpe.DefaultMerges.size === Bpe.DefaultNumMerges)
    val t = Bpe.defaultTable
    // common fixture words must collapse well below their char counts
    for (w <- Seq("table", "query", "window", "batch", "the"))
      assert(t.countWord(w) < w.length.toLong, s"no compression on '$w'")
  }

  test("trainFromCorpus (distributed freq agg) ≡ trainLocalFromTexts on the same corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val texts = docs.select("text").as[String].collect().toSeq
    val local = Bpe.trainLocalFromTexts(texts, numMerges = 32)
    val dist = Bpe.trainFromCorpus(docs, "text", numMerges = 32)
    assert(dist === local)
    assert(dist.nonEmpty)
  }

  test("native expression matches the table encoder distributed, incl. null text") {
    val rows = Seq((1L, "the query scans the table"), (2L, ""), (3L, "   "),
      (4L, null.asInstanceOf[String]), (5L, "zzz qqq"))
    val df = rows.toDF("id", "text")
    val got = df.select($"id", Bpe.countTokens($"text").as("n"))
      .as[(Long, Option[Long])].collect().toMap
    val t = Bpe.defaultTable
    assert(got(1L) === Some(t.countTokens("the query scans the table")))
    assert(got(2L) === Some(0L))
    assert(got(3L) === Some(0L))
    assert(got(4L) === None) // null in → null out
    assert(got(5L) === Some(t.countTokens("zzz qqq")))
  }

  test("encodeJoined: in-order word tokens, space-joined; count consistency") {
    val t = new BpeTable(Seq(("a", "b"), ("ab", "c"), ("l", "o"), ("lo", "w"),
      ("e", "r"), ("low", "er")))
    assert(t.encodeJoined("abcabd lower") === "abc ab d lower")
    assert(t.encodeJoined("  lowest  x ") === "low e s t x") // double space vanishes
    assert(t.encodeJoined("") === "" && t.encodeJoined("   ") === "")
    // joined form splits back to exactly countTokens tokens
    samples(Gen.listOf(word).map(_.mkString(" ")), 100).foreach { s =>
      val enc = Bpe.defaultTable.encodeJoined(s)
      val n = if (enc.isEmpty) 0L else enc.split(" ").length.toLong
      assert(n === Bpe.defaultTable.countTokens(s), s"'$s' → '$enc'")
    }
  }

  test("encodeTokens expression ≡ encodeJoined distributed, incl. null") {
    val rows = Seq((1L, "the query scans the table"), (2L, ""),
      (3L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "text")
      .select($"id", Bpe.encodeTokens($"text").as("s"))
      .as[(Long, Option[String])].collect().toMap
    assert(got(1L) === Some(Bpe.defaultTable.encodeJoined("the query scans the table")))
    assert(got(2L) === Some(""))
    assert(got(3L) === None)
  }

  test("graft_bpe_count compiles under CODEGEN_ONLY (no interpreted fallback)") {
    val fm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val fb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Seq("the table", "a window batch").toDF("text")
        .select(Bpe.countTokens($"text").as("n")).as[Long].collect().toSeq
      assert(out === Seq(
        Bpe.defaultTable.countTokens("the table"),
        Bpe.defaultTable.countTokens("a window batch")))
      val enc = Seq("the table").toDF("text")
        .select(Bpe.encodeTokens($"text").as("s")).as[String].collect().toSeq
      assert(enc === Seq(Bpe.defaultTable.encodeJoined("the table")))
    } finally {
      fm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      fb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("SQL registration: graft_bpe_count usable from spark.sql with arity guard") {
    BpeCountExpr.register(spark)
    val n = spark.sql("SELECT graft_bpe_count('the query') AS n").as[Long].head()
    assert(n === Bpe.defaultTable.countTokens("the query"))
    // zero args through THIS registration path must fail with the named
    // guard, not a raw NoSuchElementException out of children.head
    val e = intercept[Exception] { spark.sql("SELECT graft_bpe_count()").collect() }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("graft_bpe_count"), msgs)
  }
}
