package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class TrimmedMeanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tm(rows: Seq[(String, Long)], bp: Long): Map[String, (Long, Long, Long)] =
    Stats.trimmedMeanByGroup(rows.toDF("g", "v"), "g", "v", bp)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("outliers outside the trim window vanish; inside they count") {
    // 10 values: one wild high. 10% trim (1000bp) drops 1 from each end:
    // kept = 2..9 → mean 5.5 → 5500000
    val vals = (1L to 9L) :+ 1000000L
    assert(tm(vals.map("a" -> _), 1000L)("a") === (10L, 1L, 5500000L))
    // 0bp trim = plain mean including the outlier
    val untrimmed = tm(vals.map("a" -> _), 0L)("a")
    assert(untrimmed === (10L, 0L, (vals.sum * 1000000L) / 10L))
  }

  test("rank ties cannot move the result (equal values are sum-interchangeable)") {
    // six 7s and nothing else: any trimmed subset averages exactly 7
    assert(tm(Seq.fill(6)("a" -> 7L), 1000L)("a") === (6L, 0L, 7000000L))
    // values (1,1,1,9,9,9), 34% trim → k=2 each side: kept (1,9) → 5.0
    assert(tm(Seq("a" -> 1L, "a" -> 1L, "a" -> 1L, "a" -> 9L, "a" -> 9L, "a" -> 9L),
      3400L)("a") === (6L, 2L, 5000000L))
  }

  test("10⁶·sum past 2⁶³ does not overflow (the sf1 a38 failure): q/r split mean is exact") {
    // 4000 rows of 5e12: sum = 2e16, 10⁶·sum = 2e22 >> Long.Max — the old
    // (1000000 * sum) div n threw ARITHMETIC_OVERFLOW under ANSI; the
    // split computes the exact micro mean (values equal → mean = value)
    assert(tm(Seq.fill(4000)("a" -> 5000000000000L), 500L)("a")
      === (4000L, 200L, 5000000000000L * 1000000L / 1L))
    // and a non-uniform overflow case against plain math: 3 huge values,
    // no trim → mean = floor(10⁶·(a+b+c)/3) computed via BigInt
    val vs = Seq(4000000000000L, 5000000000001L, 6000000000002L)
    val expect = (BigInt(vs.sum) * 1000000 / 3).toLong
    assert(tm(vs.map("a" -> _), 0L)("a") === (3L, 0L, expect))
    // negative overflow side: trunc-toward-zero semantics preserved
    val neg = Seq(-4000000000000L, -5000000000001L, -6000000000002L)
    val negExpect = -(BigInt(-neg.sum) * 1000000 / 3).toLong
    assert(tm(neg.map("a" -> _), 0L)("a") === (3L, 0L, negExpect))
  }

  test("negative sums floor symmetrically; tiny groups keep a survivor; contract holds") {
    // mean of (-1, -2) = -1.5 → -1500000 exactly (not -1500001 from a -inf floor)
    assert(tm(Seq(("a", -1L), ("a", -2L)), 0L)("a") === (2L, 0L, -1500000L))
    // n=1 with heavy trim request: k=0, the lone row survives
    assert(tm(Seq(("b", 42L)), 4999L)("b") === (1L, 0L, 42000000L))
    intercept[IllegalArgumentException] {
      Stats.trimmedMeanByGroup(Seq(("a", 1L)).toDF("g", "v"), "g", "v", 5000L)
    }
  }
}
