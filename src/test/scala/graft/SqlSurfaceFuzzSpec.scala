package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Registry-wide readable-error sweep over EVERY registered `graft_*` table
 * function (the GraftSqlSurface.scala arg-contract: an error must name the
 * function and describe the argument — never an internal analyzer
 * exception). Iterates [[GraftSqlSurface.registeredTvfs]], so a TVF added
 * anywhere is swept by construction; a fixed count pin catches silent
 * registration loss.
 */
class SqlSurfaceFuzzSpec extends AnyFunSuite with SparkTestBase {

  // touching the session forces GraftExtensions.install → registry populated
  private lazy val tvfs: Map[String, (String, Range)] = {
    spark.sql("SELECT 1").collect()
    GraftSqlSurface.registeredTvfs
  }

  private def call(name: String, args: Seq[String]): Throwable =
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $name(${args.mkString(", ")})").collect()
    }

  test("every TVF is swept (registration count pin)") {
    assert(tvfs.size >= 52, s"only ${tvfs.size} TVFs registered: ${tvfs.keys.toSeq.sorted}")
    assert(tvfs.keys.forall(_.startsWith("graft_")))
  }

  test("wrong arity: every TVF errors with its own name and usage") {
    for ((name, (usage, arity)) <- tvfs) {
      // one below min and one above max — both must fail readably
      for (n <- Seq(arity.min - 1, arity.max + 1) if n >= 0) {
        val e = call(name, Seq.fill(n)("'x'"))
        assert(e.getMessage.contains(name),
          s"$name arity-$n error lacks the function name: ${e.getMessage}")
        assert(e.getMessage.contains(usage) || e.getMessage.contains("expected"),
          s"$name arity-$n error lacks the usage string: ${e.getMessage}")
      }
    }
  }

  test("unquoted identifier as first argument: readable, never an UnresolvedException") {
    for ((name, (_, arity)) <- tvfs) {
      val args = "zzz_unquoted_zzz" +: Seq.fill(arity.min - 1)("'x'")
      val e = call(name, args)
      val m = e.getMessage
      // either the analyzer's own resolution error for the identifier or
      // the strArg guard naming the argument; an internal
      // UnresolvedException ("Invalid call to ...") is the failure mode
      assert(!m.contains("Invalid call to"),
        s"$name leaked an UnresolvedException: $m")
      assert(m.contains("zzz_unquoted_zzz") || m.contains(name),
        s"$name unquoted-arg error names neither the identifier nor the function: $m")
    }
  }

  test("fractional literal where an integer is expected: rejected, not truncated") {
    // every TVF whose usage names a numeric argument takes it as a
    // trailing-position integer; sweep those by substituting 2.5
    val numeric = tvfs.filter { case (_, (usage, _)) =>
      usage.matches(".*\\b(maxPerGroup|gapMs|rounds|period|binSize|minOverlapBp|trimBp|nRanges|shingleSize|k|bands|thresholdBp|n|minLogitOffsetMicro)\\b.*\\)$")
    }
    assert(numeric.nonEmpty)
    // a resolvable table named x with a column named x, so the table/column
    // arguments pass and the INTEGER validation is the check that fires
    spark.sql("CREATE OR REPLACE TEMP VIEW x AS SELECT 1 AS x")
    for ((name, (_, arity)) <- numeric) {
      val args = Seq.fill(arity.min - 1)("'x'") :+ "2.5"
      val e = call(name, args)
      val m = e.getMessage.toLowerCase
      assert(m.contains("integer") || m.contains(name),
        s"$name fractional-arg error: ${e.getMessage}")
    }
  }
}
