package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Portable-register HLL sketch (ops/HllSketch.scala). */
class HllSketchSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def df(vs: Seq[(String, Long)]) = vs.toDF("grp", "v")

  test("MERGEABILITY: registers(A ∪ B) == per-bucket max(registers(A), registers(B))") {
    val a = (0L until 400L).map(i => ("g", i))
    val b = (300L until 900L).map(i => ("g", i)) // overlapping shards
    val rA = HllSketch.registers(df(a), "grp", "v")
      .select("bucket", "reg").as[(Long, Long)].collect().toMap
    val rB = HllSketch.registers(df(b), "grp", "v")
      .select("bucket", "reg").as[(Long, Long)].collect().toMap
    val rU = HllSketch.registers(df(a ++ b), "grp", "v")
      .select("bucket", "reg").as[(Long, Long)].collect().toMap
    val merged = (rA.keySet ++ rB.keySet).map { k =>
      k -> math.max(rA.getOrElse(k, 0L), rB.getOrElse(k, 0L))
    }.toMap
    assert(rU === merged)
  }

  test("registers are duplicate-insensitive (the SET property)") {
    val once = (0L until 500L).map(i => ("g", i))
    val thrice = once ++ once ++ once
    val r1 = HllSketch.registers(df(once), "grp", "v")
      .select("bucket", "reg").as[(Long, Long)].collect().toSet
    val r3 = HllSketch.registers(df(thrice), "grp", "v")
      .select("bucket", "reg").as[(Long, Long)].collect().toSet
    assert(r1 === r3)
  }

  test("estimate accuracy: within 10% at n >> m (HLL theoretical 6.5% rsd at m=256)") {
    val n = 20000L
    val out = HllSketch.summary(df((0L until n).map(i => ("g", i))), "grp", "v")
      .select("est_micro", "exact_distinct", "within_50pct")
      .as[(Long, Long, Boolean)].collect().head
    assert(out._2 === n)
    val err = math.abs(out._1 - n * 1000000L).toDouble / (n * 1000000L)
    assert(err <= 0.10, s"estimate ${out._1} off by ${err * 100}%% from $n")
    assert(out._3)
  }

  test("estimate is exactly ⌊A/S⌋: hand-checked on a forced register state") {
    // one value per group: one bucket hit with some rank R, 255 empty.
    // S = 2^(53-R) + 255·2^53; est = ⌊A/S⌋ computed independently here.
    val out = HllSketch.summary(Seq(("g", 42L)).toDF("grp", "v"), "grp", "v")
      .select("n_hit", "est_micro").as[(Long, Long)].collect().head
    assert(out._1 === 1L)
    val reg = HllSketch.registers(Seq(("g", 42L)).toDF("grp", "v"), "grp", "v")
      .select("reg").as[Long].collect().head
    val s = (BigInt(1) << (53 - reg.toInt)) + BigInt(255) * (BigInt(1) << 53)
    assert(BigInt(out._2) === HllSketch.NumeratorA / s)
  }

  test("group isolation: per-group sketches never mix") {
    val rows = (0L until 300L).map(i => (s"g${i % 3}", i))
    val out = HllSketch.summary(df(rows), "grp", "v")
      .select("grp", "exact_distinct").as[(String, Long)].collect().toMap
    assert(out === Map("g0" -> 100L, "g1" -> 100L, "g2" -> 100L))
  }
}
