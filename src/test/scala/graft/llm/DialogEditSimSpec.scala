package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the round-9 additions: transcript assembly (l80), prefix-
  * blocked edit-distance verify (l81), perplexity buckets (l82), and
  * n-gram diversity (l83). */
class DialogEditSimSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("assembleTranscripts: orders by (ts, id) regardless of input order") {
    val ev = Seq(
      // user 1 arrives shuffled; ts tie at 100 broken by event_id
      (1L, 100L, 3L, "view", """{"k": 7}"""),
      (1L, 50L, 9L, "click", """{"k": 1}"""),
      (1L, 100L, 2L, "error", """{"k": 2}"""),
      (2L, 10L, 1L, "signup", "{}")) // missing k -> '?'
      .toDF("user_id", "ts_us", "event_id", "event_type", "props")
    val out = Dialog.assembleTranscripts(ev, "user_id", "ts_us", "event_id", "event_type", "props")
      .orderBy("user_id")
      .select("user_id", "n_turns", "n_chars", "transcript")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 22L, "click=1\nerror=2\nview=7"),
      (2L, 1L, 8L, "signup=?")))
  }

  test("prefixBlockedEditVerify: catches near-identical variants, blocks cross-prefix pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + "!"),                 // 1 edit -> high sim, same prefix
      (3L, "completely different text about something else entirely here"),
      (4L, base.replace("lazy", "hazy"))) // 1 substitution
      .toDF("doc_id", "text")
    val pairs = EditSim.prefixBlockedEditVerify(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "lev").as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.forall(_._3 <= 2), s"planted pairs are <=2 edits: $pairs")
  }

  test("prefixBlockedEditVerify: block cap bounds a mega-block's pair count") {
    val boiler = "identical boilerplate page text repeated across the whole crawl"
    val docs = (1L to 100L).map(i => (i, boiler)).toDF("doc_id", "text")
    val n = EditSim.prefixBlockedEditVerify(docs, "doc_id", "text", blockCap = 16).count()
    assert(n == 16L * 15 / 2, "pairs bounded by cap*(cap-1)/2, not 100*99/2")
  }

  test("perplexityBuckets: terciles are per-language and sum to the doc count") {
    val docs = (0L until 9L).map(i => (i, s"tok$i tok${i % 3} common word", "en")) ++
      Seq((100L, "solo doc one", "fr"), (101L, "solo doc two", "fr"))
    val out = LangModel.perplexityBuckets(
      docs.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang")
      .select("lang", "bucket", "n_docs").as[(String, String, Long)].collect().toSeq
    val byLang = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byLang == Map("en" -> 9L, "fr" -> 2L))
    val enBuckets = out.filter(_._1 == "en").map(r => r._2 -> r._3).toMap
    assert(enBuckets == Map("head" -> 3L, "middle" -> 3L, "tail" -> 3L))
    // 2 fr docs over ntile(3): buckets head=1, middle=1, no tail
    val frBuckets = out.filter(_._1 == "fr").map(r => r._2 -> r._3).toMap
    assert(frBuckets == Map("head" -> 1L, "middle" -> 1L))
  }

  test("ngramDiversity: repeated template collapses the distinct-ngram ratio") {
    val docs = Seq(
      (1L, "mill", "a b c d e"), (2L, "mill", "a b c d e"), (3L, "mill", "a b c d e"),
      (4L, "fresh", "p q r s t"), (5L, "fresh", "u v w x y"))
      .toDF("doc_id", "source", "text").drop("doc_id")
    val m = CorpusStats.ngramDiversity(docs, "source", "text", n = 4)
      .select("source", "n_tokens", "n_types", "n_ngrams", "n_distinct_ngrams")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(m("mill") == ("mill", 15L, 5L, 6L, 2L))   // 3 copies: 6 grams, 2 distinct
    assert(m("fresh") == ("fresh", 10L, 10L, 4L, 4L)) // all distinct
  }

  test("ngramDiversity: sources with only short docs report null ngram ratio, not 0/0") {
    val docs = Seq(("tiny", "a b")).toDF("source", "text")
    val row = CorpusStats.ngramDiversity(docs, "source", "text", n = 4).collect()(0)
    assert(row.getAs[Long]("n_ngrams") == 0L)
    assert(row.isNullAt(row.fieldIndex("distinct_ngram_ratio")))
  }
}
