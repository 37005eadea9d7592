package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class WordPieceSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("encodeWord: greedy longest-match-first with ## continuations (hand vectors)") {
    val v = new WordPieceVocab(Seq("un", "##able", "##a", "##b", "##l", "##e",
      "able", "a", "b", "l", "e", "u", "n", "##n", "##u"))
    // longest word-initial match "un", then the longest continuation "##able"
    assert(v.encodeWord("unable").toSeq === Seq("un", "##able"))
    // word-initial "able" matches bare, not ##able
    assert(v.encodeWord("able").toSeq === Seq("able"))
    // greedy takes "un"+"##able", leaving nothing: "unablee" ends with ##e
    assert(v.encodeWord("unablee").toSeq === Seq("un", "##able", "##e"))
    // char-level fallback through continuations
    assert(v.encodeWord("ban").toSeq === Seq("b", "##a", "##n"))
  }

  test("whole-word [UNK] on any unmatched position (the BERT is_bad contract)") {
    val v = new WordPieceVocab(Seq("ab", "##c", "a", "##b"))
    // 'abz': matches ab, then z has no continuation → the WHOLE word is
    // [UNK], the already-matched 'ab' is discarded, count is 1
    assert(v.encodeWord("abz").toSeq === Seq("[UNK]"))
    // word-initial no-match (z bare absent) → [UNK] immediately
    assert(v.encodeWord("zab").toSeq === Seq("[UNK]"))
    assert(v.countTokens("abz zab abc") === 1L + 1L + 2L)
  }

  test("greedy longest-match ≠ BPE merge order on the same pieces") {
    // vocab admits both "ab c" and "a bc"; WordPiece must take the LONGEST
    // initial piece "abc" when present, regardless of any merge ranking
    val v = new WordPieceVocab(Seq("abc", "ab", "a", "##b", "##c", "##bc"))
    assert(v.encodeWord("abc").toSeq === Seq("abc"))
    val v2 = new WordPieceVocab(Seq("ab", "a", "##b", "##c", "##bc"))
    // without "abc": initial "ab" (longest), then "##c"
    assert(v2.encodeWord("abc").toSeq === Seq("ab", "##c"))
  }

  test("encodeJoined: lowercase + space-trim + whitespace split; empty→''") {
    val v = WordPiece.defaultVocab
    assert(v.encodeJoined("") === "")
    assert(v.encodeJoined("   ") === "")
    // spec step 1 lowercases before splitting
    assert(v.encodeJoined("The TABLE") === v.encodeJoined("the table"))
    // \t splits but is not trimmed; the empty leading token vanishes
    assert(v.encodeJoined("\tthe") === v.encodeJoined("the"))
  }

  test("default vocab covers the seed corpus losslessly (no [UNK], join-strip round-trips)") {
    Bpe.SeedCorpus.foreach { line =>
      val enc = WordPiece.defaultVocab.encodeJoined(line)
      assert(!enc.contains("[UNK]"), s"seed line hit UNK: $line → $enc")
      assert(enc.replace(" ", "").replace("##", "") ===
        line.toLowerCase.replaceAll("\\s+", ""), s"round-trip broke: $line")
    }
  }

  test("count == encode length; random lowercase words never UNK (char floor)") {
    val v = WordPiece.defaultVocab
    samples(Gen.listOfN(6, word).map(_.mkString(" ")), 60).foreach { text =>
      val enc = v.encodeJoined(text)
      // every lowercase char is in the vocab floor, so no UNK is possible
      assert(!enc.contains("[UNK]"), s"$text → $enc")
      val n = if (enc.isEmpty) 0L else enc.split(" ").length.toLong
      assert(v.countTokens(text) === n, s"count/encode mismatch on $text")
      // pieces reassemble the word stream exactly
      assert(enc.replace(" ", "").replace("##", "") ===
        text.toLowerCase.replaceAll("\\s+", ""))
    }
  }

  test("non-BMP code points: surrogate pairs are single scan units") {
    val v = new WordPieceVocab(Seq("😀", "##😀", "a", "##a"))
    assert(v.encodeWord("😀😀").toSeq === Seq("😀", "##😀"))
    assert(v.encodeWord("a😀").toSeq === Seq("a", "##😀"))
    // unseen BMP char still UNKs the whole word
    assert(v.encodeWord("a😀z").toSeq === Seq("[UNK]"))
  }

  test("native expressions match the Scala encoder on the documents fixture shape") {
    val texts = Seq("The query scans the table", "", "  ", null,
      "zebra Zulu 123 !!", "spark joins the batch to the window",
      "merge\tthe sorted parts") // tab split
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        WordPiece.encodeTokens(col("text")).as("enc"),
        WordPiece.countTokens(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (expEnc, expN) = if (t == null) (null, -1L)
        else (WordPiece.defaultVocab.encodeJoined(t), WordPiece.defaultVocab.countTokens(t))
      assert(got(i.toLong)._1 === expEnc, s"encode mismatch on '$t'")
      assert(got(i.toLong)._2 === expN, s"count mismatch on '$t'")
    }
  }

  test("vocab is fixed: size and spot pieces never drift (committed-oracle guard)") {
    val v = WordPiece.DefaultVocab
    assert(v === v.distinct.sorted)
    // the seed corpus is lowercase a-z only → every piece is too
    assert(v.forall(p => p.stripPrefix("##").forall(c => c >= 'a' && c <= 'z')))
    assert(v.contains("the") || v.contains("th"), "common seed word missing")
  }
}
