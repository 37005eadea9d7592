package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import graft.SparkTestBase

/**
 * Round-14 optimization spec: the native one-pass [[MinHashSeeds]]
 * signature must be BIT-IDENTICAL to the k-pass HOF form it replaced
 * (`array_min(transform(sh, h => seedMix(h, i)))` per seed) for BOTH hash
 * families — the l5p/l6p/l13p oracles replay the portable seed mixes
 * value-for-value, so any drift here is an oracle break, not just a perf
 * bug.
 */
class MinHashSeedsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val k = 32

  // adversarial hash inputs: negatives (raw xxhash64 range), zero, huge,
  // single-element, and a null element mid-array
  private def frames = {
    val rng = new scala.util.Random(7)
    val rows = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(1 + rng.nextInt(30))(rng.nextLong()))) ++ Seq(
      (100L, Seq(0L)),
      (101L, Seq(Long.MaxValue, Long.MinValue + 1, -1L)),
      (102L, Seq((1L << 60) - 1, 42L)))
    rows.toDF("id", "sh")
  }

  private def hof(sh: org.apache.spark.sql.Column, family: MinHashFamily) =
    when(size(sh) > 0, array((0 until k).map(i =>
      array_min(transform(sh, h => family.seedMix(h, i)))): _*))
      .otherwise(lit(null).cast("array<bigint>"))

  for ((name, family) <- Seq("xx64" -> Xx64Family, "portable" -> PortableFamily)) {
    test(s"native one-pass signature == k-pass HOF ($name family)") {
      val got = frames.select(
        Dedup.minhashFromHashedShingles(col("sh"), k, family).as("nat"),
        hof(col("sh"), family).as("ref"))
      assert(got.filter(not(col("nat") <=> col("ref"))).count() === 0L)
    }
  }

  test("null element matches HOF semantics for both families") {
    val withNull = Seq(Tuple1(Seq[java.lang.Long](5L, null, 9L)))
      .toDF("sh").select(col("sh").cast("array<bigint>").as("sh"))
    for (family <- Seq(Xx64Family, PortableFamily)) {
      val got = withNull.select(
        Dedup.minhashFromHashedShingles(col("sh"), k, family).as("nat"),
        hof(col("sh"), family).as("ref"))
      assert(got.filter(not(col("nat") <=> col("ref"))).count() === 0L)
    }
  }

  test("interpreted eval matches codegen") {
    val e = MinHashSeeds(expression(col("sh")), k, portable = false)
    val df = frames.select(column(e).as("a"))
    // force interpreted path via a plan that falls back (nondeterministic
    // wrapper defeats whole-stage codegen fusion of the projection)
    val interp = frames.select(column(MinHashSeeds(expression(col("sh")), k, portable = false)).as("a"),
      rand().as("_r")).drop("_r")
    assert(df.collect().map(_.toSeq).toSeq === interp.collect().map(_.toSeq).toSeq)
  }
}
