package graft.normalize

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.types.{BqType, TypeInference}

/**
 * Property tests (scalacheck generators with fixed seeds — deterministic):
 * the Column expression and the pure-Scala twin of normalizeValue must
 * agree on EVERY string, and the type lattice must be order-insensitive
 * (set semantics) and absorbed by STRING.
 */
class NormalizePropertySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val interesting: Gen[String] = Gen.oneOf(
    Gen.oneOf(Normalize.NullMarkers),
    Gen.oneOf("yes", "No", "TRUE", "false", "Y", "on"),
    Gen.chooseNum(-1000000L, 1000000L).map(_.toString),
    Gen.chooseNum(-9999.0, 9999.0).map(d => f"$d%.3f"),
    Gen.chooseNum(0, 99).map(n => f"00$n%02d"),       // leading-zero ids
    Gen.chooseNum(-50, 50).map(n => s"${n}e2"),        // exponent forms
    Gen.alphaNumStr.map(s => s" $s "),                 // padded text
    Gen.asciiPrintableStr.suchThat(s => !s.contains("\n") && !s.contains("\r")))

  test("Column normalizeValue ≡ normalizeValueScala on arbitrary strings") {
    val inputs = samples(interesting, 400)
    assert(inputs.size > 300)
    val df = inputs.toDF("v").select(Normalize.normalizeValue($"v").as("n"))
    val got = df.collect().map(r => Option(r.getString(0))).toSeq
    val want = inputs.map(Normalize.normalizeValueScala)
    got.zip(want).zip(inputs).foreach { case ((g, w), in) =>
      assert(g === w, s"input='$in'")
    }
  }

  test("lattice: STRING absorbs; singleton identity; _id override; set semantics") {
    val scalar: Gen[BqType] = Gen.oneOf[BqType](BqType.BOOL, BqType.INT64, BqType.FLOAT64,
      BqType.NUMERIC, BqType.STRING, BqType.DATE, BqType.TIME, BqType.TIMESTAMP)
    samples(Gen.nonEmptyListOf(scalar), 200).foreach { ts =>
      val set: Set[BqType] = ts.toSet
      // STRING absorbs everything
      assert(TypeInference.resolveTypeConflict("f", set + BqType.STRING) === BqType.STRING)
      // singleton resolves to itself
      assert(TypeInference.resolveTypeConflict("f", Set(ts.head)) === ts.head)
      // _id fields force STRING regardless of content
      assert(TypeInference.resolveTypeConflict("thing_id", set) === BqType.STRING)
      // resolution is a function of the SET (order-insensitive by construction)
      assert(TypeInference.resolveTypeConflict("f", set) ===
        TypeInference.resolveTypeConflict("f", ts.reverse.toSet))
    }
  }
}
