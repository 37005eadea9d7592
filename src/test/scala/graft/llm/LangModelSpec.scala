package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class LangModelSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("bigramSurprisal: hand-computed add-one bigram NLL; blank docs absent") {
    // corpus bigrams: doc0 (BOS,a)(a,b)(b,a), doc1 (BOS,a)(a,b)
    // c2: (BOS,a)=2 (a,b)=2 (b,a)=1; c1: BOS=2 a=2 b=1; V={a,b}=2
    // P(BOS→a)=P(a→b)=3/4, P(b→a)=2/3
    val docs = Seq((0L, "a b a"), (1L, "A b"), (2L, "   ")).toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(2L)) // token-less docs have no bigrams
    val nl34 = BigDecimal(-math.log(3.0 / 4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nl23 = BigDecimal(-math.log(2.0 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (_, n0, nll0, avg0) = out(0L)
    assert(n0 === 3L)
    assert(math.abs(nll0 - (2 * nl34 + nl23)) < 1e-9, s"nll0=$nll0")
    assert(math.abs(avg0 - nll0 / 3) < 1e-12)
    val (_, n1, nll1, _) = out(1L) // case-folds to "a b"
    assert(n1 === 2L)
    assert(math.abs(nll1 - 2 * nl34) < 1e-9, s"nll1=$nll1")
  }

  test("self-scoring flags out-of-distribution text with the highest surprisal") {
    val fluent = (0L until 20L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val oov = Seq((99L, "zxq wvu tsr qpo nml kji"))
    val docs = (fluent ++ oov).toDF("doc_id", "text")
    val scores = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val worst = scores.maxBy(_._2)._1
    assert(worst === 99L, s"expected the gibberish doc to score worst: $scores")
    // every repeated fluent doc scores identically (pure function of text)
    assert(fluent.map(f => scores(f._1)).distinct.size === 1)
  }

  /** Independent naive interpolated-KN over a token corpus: returns
    * P(w|prev) for ANY (prev, w) with prev seen — including unseen
    * bigrams (the backoff path the operator's self-scoring never hits
    * but the proper-distribution property needs). */
  private def naiveKn(docs: Seq[Seq[String]], d: Double): (String, String) => Double = {
    val bigrams = docs.filter(_.nonEmpty)
      .flatMap(tk => (LangModel.Bos +: tk.dropRight(1)).zip(tk))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1p = c2.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1c = c2.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nt = c2.size.toLong
    (prev, w) =>
      (math.max(c2.getOrElse((prev, w), 0L) - d, 0.0) +
        d * n1p(prev) * n1c.getOrElse(w, 0L) / nt) / c1(prev)
  }

  test("kneserNeyScores: matches a naive KN replay; distribution sums to 1") {
    val texts = Map(
      0L -> "san francisco is big", 1L -> "san francisco bay",
      2L -> "the bay is big", 3L -> "the big dog", 4L -> "is big san francisco")
    val docs = (texts.toSeq :+ (9L -> "   ")).toDF("doc_id", "text")
    val toks = texts.values.map(_.split(" ").toSeq).toSeq
    val p = naiveKn(toks, 0.75)
    val out = LangModel.kneserNeyScores(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(9L))
    texts.foreach { case (id, text) =>
      val tk = text.split(" ").toSeq
      val expect = (LangModel.Bos +: tk.dropRight(1)).zip(tk)
        .map { case (a, b) =>
          BigDecimal(-math.log(p(a, b))).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      val (_, n, nll, avg) = out(id)
      assert(n === tk.size.toLong)
      assert(math.abs(nll - expect) < 1e-9, s"doc $id: $nll vs $expect")
      assert(math.abs(avg - nll / n) < 1e-12)
    }
    // interpolated KN is a PROPER distribution: for every seen context,
    // P sums to exactly 1 over the full vocabulary (incl. unseen pairs)
    val vocab = toks.flatten.distinct
    val contexts = LangModel.Bos +: toks.flatMap(_.dropRight(1)).distinct
    contexts.distinct.foreach { prev =>
      val mass = vocab.map(w => p(prev, w)).sum
      assert(math.abs(mass - 1.0) < 1e-12, s"context '$prev' mass $mass")
    }
    // "francisco" only ever follows "san": its continuation probability is
    // minimal, so KN penalizes it in a NOVEL context far more than add-one
    // count ratios would suggest — the signature Kneser-Ney behavior
    assert(p("the", "francisco") < p("the", "is"))
  }

  test("pmiCollocations: exact naive replay (joint + marginals + micro-quotient), minCount, tie order") {
    // "san francisco" always co-occurs (perfect collocation); "the" pairs
    // with everything (low PMI); rare pair "odd ball" sits below minCount
    val texts = (0L until 12L).map(i => (i, "the san francisco bay near the big dog")) ++
      Seq((20L, "odd ball the san francisco"), (21L, "the dog"))
    val docs = texts.toDF("doc_id", "text")
    val got = LangModel.pmiCollocations(docs, "doc_id", "text", minCount = 5L, topK = 10)
      .as[(String, String, Long, Long)].collect()

    // naive replay — the exact integer micro-quotient (10⁶·c·n) div (cx·cy),
    // in BigInt so the replay is floor-exact like the engine's DECIMAL div
    val pairs = texts.flatMap { case (_, t) =>
      val tk = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      tk.dropRight(1).zip(tk.drop(1))
    }
    val c2 = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cxm = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cym = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = pairs.size.toLong
    val expect = c2.filter(_._2 >= 5L).map { case ((x, y), c) =>
      val micro = (BigInt(c) * n * 1000000 / (BigInt(cxm(x)) * cym(y))).toLong
      (x, y, c, micro)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(10)

    assert(got.toSeq.map(t => (t._1, t._2, t._3, t._4)) === expect)
    assert(!got.exists(r => r._1 == "odd"), "below-minCount pair must be cut")
    // the deterministic-1:1 pair outranks the promiscuous stopword pair:
    // "the" opens three different bigrams, so (the, san) dilutes its PMI
    val rank = got.zipWithIndex.map { case (r, i) => (r._1, r._2) -> i }.toMap
    assert(rank(("san", "francisco")) < rank(("the", "san")))
  }
}
