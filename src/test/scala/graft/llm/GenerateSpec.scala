package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Greedy bigram-LM generation (llm/Generate.scala). */
class GenerateSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def gen(texts: Seq[String], nSeeds: Int = 2, steps: Int = 5) =
    Generate.greedyGenerate(spark, texts.toDF("text"), "text", nSeeds, steps)
      .as[(String, String, Long)].collect().map(r => r._1 -> r).toMap

  test("hand-computed rollout: argmax successor, ties to smallest next token") {
    // bigrams: (a,b)x2, (a,c)x1 → succ(a)=b; (b,a)x1 → succ(b)=a
    // unigrams: a x3, b x2, c x1 → seeds (2) = a, b
    val m = gen(Seq("a b a b", "a c"))
    assert(m("a") === (("a", "a b a b a b", 5L)))
    assert(m("b") === (("b", "b a b a b a", 5L)))
  }

  test("tie on count breaks to the lexicographically smallest next") {
    // (x,m)x1 and (x,k)x1 tie → succ(x)=k; k has no successor → stops
    val m = gen(Seq("x m", "x k"), nSeeds = 1, steps = 5)
    assert(m("x") === (("x", "x k", 1L)))
  }

  test("rollout stops early when the chain dies; lowercasing applies") {
    val m = gen(Seq("END"), nSeeds = 1, steps = 7)
    assert(m("end") === (("end", "end", 0L))) // no bigrams at all
  }

  test("seed order is (count desc, token asc)") {
    val m = gen(Seq("b b b", "a a a", "z"), nSeeds = 2, steps = 1)
    // a and b both x3 → seeds a, b (asc); z (x1) excluded
    assert(m.keySet === Set("a", "b"))
  }
}
