package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Code-vs-prose signals (llm/CodeDetect.scala). */
class CodeDetectSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def sig(texts: Seq[String]) =
    CodeDetect.signals(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
        "id", "text")
      .as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap

  test("code flags on syntax density OR keyword count; prose stays clean") {
    val m = sig(Seq(
      "def area(r): return pi * r * r",              // 0: kws def+return → code
      "the quick brown fox jumps over the lazy dog", // 1: prose
      "x = [1, 2, 3]; y = {4: 5}",                   // 2: dense symbols → code
      "if wishes were horses beggars would ride",    // 3: ONE keyword (if) only
      ""))                                           // 4: empty → all zeros
    assert(m(0L)._6 && m(0L)._4 === 2L)     // def + return
    assert(!m(1L)._6 && m(1L)._3 === 0L && m(1L)._4 === 0L)
    assert(m(2L)._6 && m(2L)._3 >= 8L)      // = [ , ] ; = { : }
    assert(!m(3L)._6, "one keyword alone must not flag")
    assert(m(4L) === ((4L, 0L, 0L, 0L, 0L, false)))
  }

  test("keyword matches are word-bounded: substrings never count") {
    val m = sig(Seq("the classic iffy deft formula while1 furloughs"))
    // classic⊅class, iffy⊅if, deft⊅def, formula⊅for, while1⊅while: \b blocks all
    assert(m(0L)._4 === 0L)
    val m2 = sig(Seq("while x: for y"))
    assert(m2(0L)._4 === 2L)
  }

  test("sym_micro is the exact integer floor of n_sym*1e6/n_chars") {
    val t = "abc;" // 1 symbol, 4 chars → floor(1e6/4) = 250000
    val m = sig(Seq(t))
    assert(m(0L)._5 === 250000L)
    assert(m(0L)._6, "25% symbol density must flag")
  }
}
