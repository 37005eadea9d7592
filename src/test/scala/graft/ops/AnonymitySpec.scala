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

  test("tClosenessAudit: hand-computed ordered EMD in exact micro-units") {
    import org.apache.spark.sql.functions.col
    // global = uniform over buckets 0..3; class A concentrates low, class
    // B concentrates high (both EMD 1/3), class C matches global (EMD 0)
    val rows =
      Seq(("A", 0L), ("A", 0L), ("A", 1L), ("A", 1L),
        ("B", 2L), ("B", 2L), ("B", 3L), ("B", 3L),
        ("C", 0L), ("C", 1L), ("C", 2L), ("C", 3L)).toDF("cls", "bk")
    val out = Anonymity.tClosenessAudit(rows, Seq("cls"), col("bk"),
        tMicro = 150000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // EMD(A) = (1/3)(0.25 + 0.5 + 0.25 + 0) = 1/3 → floor to 333333 micro
    assert(out("A") === (("A", 4L, 4L, 333333L, true)))
    assert(out("B") === (("B", 4L, 4L, 333333L, true)))
    assert(out("C") === (("C", 4L, 4L, 0L, false)))
  }

  test("tClosenessAudit: l-diverse class can still violate t (the ladder's point)") {
    import org.apache.spark.sql.functions.col
    // class D has 3 DISTINCT sensitive buckets (l-diversity passes at
    // l=3) but all of them low vs a global spread to bucket 9
    val rows = (Seq.fill(6)("D") zip Seq(0L, 1L, 2L, 0L, 1L, 2L)) ++
      (Seq.fill(6)("E") zip Seq(7L, 8L, 9L, 7L, 8L, 9L))
    val out = Anonymity.tClosenessAudit(rows.toDF("cls", "bk"), Seq("cls"),
        col("bk"), tMicro = 150000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(out.forall(_._5), s"both skewed classes must violate t: ${out.toSeq}")
  }

  test("tClosenessAudit: NULL buckets are excluded, never an NPE (ADVICE r10)") {
    import org.apache.spark.sql.functions.col
    // a NULL sensitive attribute has no position in the ordered domain —
    // the row drops from BOTH the global histogram and the class counts
    // (it previously NPE'd the histogram collect at construction)
    val rows = Seq(("A", Some(0L)), ("A", Some(1L)), ("A", None),
        ("B", Some(0L)), ("B", Some(1L)))
      .toDF("cls", "bk")
    val out = Anonymity.tClosenessAudit(rows, Seq("cls"), col("bk"),
        tMicro = 150000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // after the NULL drop both classes are the uniform {0,1}: EMD 0
    assert(out("A") === (("A", 2L, 2L, 0L, false)))
    assert(out("B") === (("B", 2L, 2L, 0L, false)))
  }
}
