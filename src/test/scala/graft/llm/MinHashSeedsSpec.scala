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
    // Round 15 (ADVICE): the old form wrapped the projection in rand(),
    // which does NOT disable whole-stage codegen — nullSafeEval was never
    // exercised. Genuinely cover the interpreted path by calling eval()
    // on InternalRows directly and comparing to the codegen'd plan.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val inputs: Seq[Seq[java.lang.Long]] =
      frames.collect().map(_.getSeq[Long](1).map(java.lang.Long.valueOf): Seq[java.lang.Long]).toSeq :+
        Seq[java.lang.Long](5L, null, 9L)
    for (portable <- Seq(false, true)) {
      val e = MinHashSeeds(
        BoundReference(0, ArrayType(LongType, containsNull = true), nullable = true),
        k, portable)
      val interp = inputs.map { sh =>
        val arr = new GenericArrayData(sh.map(v => if (v == null) null else v.longValue()).toArray[Any])
        e.eval(InternalRow(arr)).asInstanceOf[ArrayData].toObjectArray(LongType).toSeq
      }
      val codegen = inputs.zipWithIndex.map { case (sh, i) => (i.toLong, sh) }
        .toDF("id", "sh")
        .select(col("id"), column(MinHashSeeds(expression(col("sh")), k, portable)).as("a"))
        .orderBy("id")
        .collect().map(r => Option(r.getSeq[java.lang.Long](1)).map(_.toSeq).orNull).toSeq
      assert(interp.map(_.map(Option(_).map(_.toString).orNull)) ===
        codegen.map(_.map(v => Option(v).map(_.toString).orNull)))
    }
  }
}
