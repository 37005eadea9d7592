package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class AnonymitySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // class (US, A): 3 rows, 3 distinct salaries
    ("US", "A", 100.0), ("US", "A", 200.0), ("US", "A", 300.0),
    // class (US, B): 2 rows, 1 distinct salary — violates l at l=2
    ("US", "B", 100.0), ("US", "B", 100.0),
    // class (DE, A): 1 row — violates k at k=2
    ("DE", "A", 500.0)
  ).toDF("country", "grade", "salary")

  test("kAnonymityAudit: class sizes, diversity, and both flags") {
    val audit = Anonymity.kAnonymityAudit(rows, Seq("country", "grade"),
        "salary", k = 2, l = 2)
      .as[(String, String, Long, Long, Boolean, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(audit(("US", "A")) === (("US", "A", 3L, 3L, false, false)))
    assert(audit(("US", "B")) === (("US", "B", 2L, 1L, false, true)))
    assert(audit(("DE", "A")) === (("DE", "A", 1L, 1L, true, true)))
  }

  test("suppressViolatingClasses: release satisfies k-anonymity by construction") {
    val out = Anonymity.suppressViolatingClasses(rows, Seq("country", "grade"),
      "salary", k = 2)
    assert(out.count() === 5) // the singleton (DE, A) class is suppressed
    val reaudit = Anonymity.kAnonymityAudit(out, Seq("country", "grade"),
        "salary", k = 2, l = 1)
      .filter("violates_k").count()
    assert(reaudit === 0)
  }
}
