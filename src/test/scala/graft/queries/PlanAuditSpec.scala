package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/**
 * Registry-wide 100 TB posture gate: NO registered query may plan a
 * CartesianProduct or BroadcastNestedLoopJoin — the two shapes that turn
 * into cluster-killers at scale. DedupSpec/AnnSpec assert this for the
 * near-dup family specifically; this spec locks it in for every query so a
 * future regression (a dropped join key, a non-equi condition slipping in)
 * fails CI instead of surfacing as a 100× slowdown in production.
 */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = Registry.all.flatMap { case (name, q) =>
      val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
      Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(plan.contains).map(op => s"$name → $op")
    }
    assert(offenders.isEmpty, s"nested-loop shapes planned:\n${offenders.mkString("\n")}")
  }
}
