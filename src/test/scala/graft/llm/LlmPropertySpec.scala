package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Property tests (fixed-seed scalacheck generators — deterministic) for the
 * invariants the portable-oracle scheme rests on: hash ranges that keep the
 * universal-hash arithmetic overflow-free under ANSI mode, agreement
 * between the native expressions and their Column-expression definitions,
 * and the structural guarantees (shingle counts, fingerprint order
 * sensitivity) the dedup operators assume.
 */
class LlmPropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val word: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("the", "a", "naïve", "Ω", "x1", "..", "-"),
    Gen.asciiPrintableStr.suchThat(s => s.nonEmpty && !s.exists(_.isWhitespace)))

  test("portableHash60 ∈ [0, 2^60) and native ≡ hex-string/conv definition") {
    val words = samples(word, 300).distinct
    val both = words.toDF("w")
      .select(graft.llm.TextOps.portableHash60($"w").as("h"),
        graft.llm.TextOps.portableHash60Sql($"w").as("hs"))
      .as[(Long, Long)].collect()
    words.zip(both).foreach { case (w, (h, hs)) =>
      assert(h >= 0L && h < (1L << 60), s"'$w' → $h out of range")
      assert(h === hs, s"'$w': native=$h conv=$hs")
      assert(SimHashPortable60.hash60(w.getBytes("UTF-8")) === h, s"'$w' static helper diverged")
    }
  }

  test("PortableFamily seedMix/bandHash stay in [0, P): ANSI-safe by range") {
    // overflow-freedom argument: seedMix multiplies a < 2^31 by (h mod P)
    // < 2^31 → < 2^62; bandHash folds acc < P with *8191 + v < 2^44 + 2^31.
    // The property below is the runtime half: outputs never leave [0, P).
    val P = PortableFamily.P
    val hashes = samples(Gen.chooseNum(0L, (1L << 60) - 1), 300)
    val df = hashes.toDF("h")
    val mixed = df.select((0 until 64 by 7).map(i =>
      PortableFamily.seedMix($"h", i).as(s"m$i")): _*).collect()
    mixed.foreach(r => (0 until r.length).foreach { i =>
      val v = r.getLong(i); assert(v >= 0 && v < P, s"seedMix out of range: $v")
    })
    val band = df.groupBy().agg(collect_list($"h").as("sig")).select(
      (0 until 8).map(b => PortableFamily.bandHash(slice($"sig", b * 4 + 1, 4), b).as(s"b$b")): _*)
      .collect()(0)
    (0 until 8).foreach { b =>
      val v = band.getLong(b); assert(v >= 0 && v < P, s"bandHash out of range: $v")
    }
  }

  test("shingle count = max(0, tokens − n + 1) for n in 2..4") {
    val docs = samples(Gen.listOf(word).map(_.mkString(" ")), 200)
    (2 to 4).foreach { n =>
      val got = docs.toDF("text")
        .select(size(TextOps.shingles($"text", n)).as("c")).as[Int].collect()
      docs.zip(got).foreach { case (d, c) =>
        val toks = d.trim.split("\\s+").count(_ => true)
        // split("") yields one empty token — mirror exactly what the
        // pipeline sees rather than special-casing blank docs
        val expected = math.max(0, toks - n + 1)
        assert(c === expected, s"n=$n doc='$d' tokens=$toks got=$c")
      }
    }
  }

  test("docFingerprint is order-sensitive and deterministic") {
    val docs = samples(Gen.listOfN(5, word).map(_.toSeq).suchThat(_.distinct.size == 5), 100)
    val texts = docs.map(_.mkString(" "))
    val swapped = docs.map(ws => (ws.tail :+ ws.head).mkString(" "))
    val fp = (texts ++ swapped ++ texts).toDF("t")
      .select(TextOps.docFingerprint($"t").as("f")).as[Long].collect()
    val (orig, rest) = fp.splitAt(texts.size)
    val (rot, again) = rest.splitAt(texts.size)
    orig.indices.foreach { i =>
      assert(orig(i) === again(i), s"doc ${texts(i)}: fingerprint not deterministic")
      assert(orig(i) !== rot(i), s"doc ${texts(i)}: rotation collided")
    }
  }

  test("jaccard ∈ [0,1], self-similarity 1 for docs with shingles") {
    val docs = samples(Gen.listOfN(6, word).map(_.mkString(" ")), 100)
    val pairs = samples(Gen.zip(Gen.choose(0, docs.size - 1), Gen.choose(0, docs.size - 1)), 100)
    def sh(c: org.apache.spark.sql.Column) =
      TextOps.shingleHashesFromTokenHashes(TextOps.tokenHashes(c), 3)
    val df = pairs.map { case (i, j) => (docs(i), docs(j), i == j) }.toDF("a", "b", "same")
    val rows = df.select(
      Dedup.jaccard(sh($"a"), sh($"b")).as("j"),
      $"same", size(sh($"a")).as("na")).collect()
    rows.foreach { r =>
      val j = r.getDouble(0)
      assert(j >= 0.0 && j <= 1.0, s"jaccard out of range: $j")
      if (r.getBoolean(1) && r.getInt(2) > 0) assert(j === 1.0, s"self-jaccard $j != 1")
    }
  }
}
