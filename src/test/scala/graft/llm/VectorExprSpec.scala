package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Native dot product (llm/VectorExpr.scala) vs the HOF fold it replaced. */
class VectorExprSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the aggregate(zip_with) fold on float and double arrays") {
    // accumulation order matters in floats: use values whose partial sums
    // genuinely lose precision so a reordered sum would differ
    val rows = Seq(
      (Array(1e16f, 1f, -1e16f, 3.3f), Array(1f, 1f, 1f, 1f)),
      (Array(0.1f, 0.2f, 0.3f, 0.4f), Array(9.9f, -8.8f, 7.7f, -6.6f)),
      (Array.fill(64)(0.123f), Array.tabulate(64)(i => (i - 32).toFloat)))
    val df = rows.toDF("a", "b")
    val out = df.select(
        Ann.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) === java.lang.Double.doubleToLongBits(h))
    }
    val dd = Seq((Array(1e-17, 1.0, -1.0, 2.5e-17), Array(1.0, 1e-17, 1e-17, 4.0)))
      .toDF("a", "b")
      .select(Ann.dot(col("a"), col("b")).as("n"), hofDot(col("a"), col("b")).as("h"))
      .as[(Double, Double)].collect().head
    assert(java.lang.Double.doubleToLongBits(dd._1) === java.lang.Double.doubleToLongBits(dd._2))
  }

  test("NULL array propagates null; ragged lengths fail fast") {
    val withNull = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(Ann.dot(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect().head
    assert(withNull === None)

    val err = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b")
        .select(Ann.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("length mismatch")
      || Option(err.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("works inside higher-order-function lambdas (interpreted eval path)") {
    val out = Seq((Array(1.0, 2.0), Seq(Array(3.0, 4.0), Array(0.5, 0.25))))
      .toDF("q", "cands")
      .select(transform(col("cands"), c => Ann.dot(col("q"), c)).as("sims"))
      .as[Seq[Double]].collect().head
    assert(out === Seq(11.0, 1.0))
  }
}
