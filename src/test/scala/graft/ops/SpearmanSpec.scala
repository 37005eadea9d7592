package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class SpearmanSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def rho(rows: Seq[(String, Double, Double)]): Map[String, (Option[Double], Long)] =
    Stats.spearmanByGroup(rows.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Option[Double], Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("perfect monotone association is ±1 even when nonlinear") {
    // y = x³ is nonlinear: Pearson < 1, Spearman exactly 1
    val up = rho(Seq(("a", 1.0, 1.0), ("a", 2.0, 8.0), ("a", 3.0, 27.0), ("a", 4.0, 64.0)))
    assert(up("a") === (Some(1.0), 4L))
    val down = rho(Seq(("a", 1.0, 64.0), ("a", 2.0, 27.0), ("a", 3.0, 8.0), ("a", 4.0, 1.0)))
    assert(down("a") === (Some(-1.0), 4L))
  }

  test("ties take average ranks: hand-computed Pearson-on-ranks") {
    // x ranks (avg over the tied 2s): 1, 2.5, 2.5, 4; y ranks: 1, 3, 2, 4
    // rho = 4.5 / sqrt(4.5 * 5) = 0.9486832…
    val out = rho(Seq(("a", 1.0, 1.0), ("a", 2.0, 3.0), ("a", 2.0, 2.0), ("a", 4.0, 4.0)))
    assert(out("a") === (Some(0.948683), 4L))
  }

  test("degenerate groups: constant side has no rank variance → NULL, groups independent") {
    val out = rho(Seq(
      ("c", 5.0, 1.0), ("c", 5.0, 2.0), ("c", 5.0, 3.0), // constant x
      ("b", 1.0, 2.0), ("b", 2.0, 1.0)))                 // clean -1
    assert(out("c") === (None, 3L))
    assert(out("b") === (Some(-1.0), 2L))
  }
}
