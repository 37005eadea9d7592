package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextOpsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(1).toDF("x").select(c.as("r")).as[T].collect()(0)

  test("token counting: whitespace + BPE-ish units") {
    val df = Seq("the quick  brown fox", "", "  ", "a-b c1d2").toDF("t")
      .select(TextOps.tokenCount($"t").as("w"), TextOps.bpeishCount($"t").as("b"))
    val got = df.as[(Long, Long)].collect().toSeq
    assert(got(0) === ((4L, 4L)))
    assert(got(1) === ((0L, 0L)))
    assert(got(2) === ((0L, 0L)))
    // "a-b c1d2" → bpeish: a, -, b, c, 1, d, 2 = 7 units, 2 whitespace tokens
    assert(got(3) === ((2L, 7L)))
  }

  test("language ID picks the stopword-richest language; 'und' when none") {
    val df = Seq(
      "the cat and the dog of a house",
      "der hund und die katze ist ein tier",
      "el gato y la casa es un lugar",
      "xyzzy plugh qwerty").toDF("t")
      .select(TextOps.langIdHeuristic($"t").as("l"))
    assert(df.as[String].collect().toSeq === Seq("en", "de", "es", "und"))
  }

  test("quality score: longer clean prose beats short punctuation soup") {
    val df = Seq(
      "This is a reasonably long and clean paragraph of ordinary text that goes on for a while and contains many normal words of sensible length throughout the entire passage, making it score well.",
      "!!! ??? ### $$$ %%%",
      "ok").toDF("t")
      .select(TextOps.qualityScore($"t").as("q"))
    val Seq(good, punct, short) = df.as[Double].collect().toSeq
    assert(good > 0.5 && punct < 0.2 && short < 0.2)
    assert(good > punct && good > short)
  }

  test("shingles and hashed shingles align in count; fingerprint is order-sensitive") {
    val df = Seq("a b c d e").toDF("t").select(
      TextOps.shingles($"t", 3).as("s"),
      TextOps.tokenHashes($"t").as("th"))
      .select(size($"s").as("ns"),
        size(TextOps.shingleHashesFromTokenHashes($"th", 3)).as("nh"))
    assert(df.as[(Int, Int)].collect()(0) === ((3, 3)))
    val fp = Seq("a b c", "c b a").toDF("t")
      .select(TextOps.docFingerprint($"t").as("f")).as[Long].collect()
    assert(fp(0) !== fp(1))
  }

  test("shingles of docs shorter than n are EMPTY (sequence(1,0) descending trap)") {
    // 0-, 1-, and 2-token docs at shingleSize=3 must all yield zero shingles,
    // not throw (slice start 0) or emit two bogus [1,0]-indexed shingles.
    val df = Seq("", "  ", "one", "one two", "one two three").toDF("t").select(
      size(TextOps.shingles($"t", 3)).as("ns"),
      size(TextOps.shingleHashesFromTokenHashes(TextOps.tokenHashes($"t"), 3)).as("nh"))
    val got = df.as[(Int, Int)].collect().toSeq
    assert(got === Seq((0, 0), (0, 0), (0, 0), (0, 0), (1, 1)))
  }

  test("slidingWindows: coverage, overlap, short-doc and edge semantics") {
    val docs = Seq(
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")), // 11 toks: ceil(5/4)+1 = 3 wins at 0,4,8
      (2L, "a b c"),                                  // ≤ window → exactly one window
      (3L, ""), (4L, "   "), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextOps.slidingWindows(docs, "doc_id", "text",
        windowTokens = 6, strideTokens = 4)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got.keySet === Set(1L, 2L)) // blank/null docs yield nothing
    val w1 = got(1L)
    assert(w1.map(_._2) === Seq(0L, 1L, 2L))
    assert(w1(0)._3 === "t1 t2 t3 t4 t5 t6" && w1(0)._4 === 6L)
    assert(w1(1)._3 === "t5 t6 t7 t8 t9 t10" && w1(1)._4 === 6L)
    assert(w1(2)._3 === "t9 t10 t11" && w1(2)._4 === 3L) // short tail window
    // every token appears in some window; consecutive windows overlap
    assert(w1.flatMap(_._3.split(" ")).toSet === (1 to 11).map(i => s"t$i").toSet)
    assert(got(2L) === Seq((2L, 0L, "a b c", 3L)))
    // plan is shuffle-free: windows are generated in the scan stage
    val plan = TextOps.slidingWindows(docs, "doc_id", "text", 6, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("fimTransform: PSM round-trip from reported cuts, short-doc all-prefix, seeded determinism") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val texts = Map(
      0L -> "alpha beta gamma delta epsilon zeta eta theta",
      1L -> "one two",             // < 3 tokens → all-prefix
      2L -> "x y z",
      3L -> "lorem ipsum dolor sit amet consectetur")
    val docs = texts.toSeq.toDF("doc_id", "text")
    val out = TextOps.fimTransform(docs, "doc_id", "text", seed = "f1")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    texts.foreach { case (id, text) =>
      val (_, n, lo, hi, got) = out(id)
      val tk = text.trim.split("\\s+")
      assert(n === tk.length.toLong)
      assert(0L <= lo && lo <= hi && hi <= n, s"doc $id cuts ($lo,$hi) of $n")
      // round-trip: rebuild the PSM string from the REPORTED cuts
      val expect = md5hex("<PRE>" + tk.take(lo.toInt).mkString(" ") +
        "<SUF>" + tk.drop(hi.toInt).mkString(" ") +
        "<MID>" + tk.slice(lo.toInt, hi.toInt).mkString(" "))
      assert(got === expect, s"doc $id")
    }
    // short doc: whole text in the prefix, empty suffix and middle
    val (_, n1, lo1, hi1, _) = out(1L)
    assert(lo1 === n1 && hi1 === n1)
    // same seed reproduces; another seed moves at least one cut pair
    val again = TextOps.fimTransform(docs, "doc_id", "text", seed = "f1")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(again === out)
    val moved = TextOps.fimTransform(docs, "doc_id", "text", seed = "f9")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(moved !== out)
    // expression-only: no shuffle in the plan
    val plan = TextOps.fimTransform(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("wordDropout: nominal rate, determinism, membership preserved") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.wordDropout(docs, "doc_id", "text", dropPct = 10, seed = "d1")
      .as[(Long, String, Long, Long)].collect()
    // every input doc keeps a row, even if all tokens dropped
    assert(out.length === docs.count())
    val (tot, kept) = out.foldLeft((0L, 0L)) { case ((t, k), r) => (t + r._3, k + r._4) }
    val rate = 1.0 - kept.toDouble / tot
    assert(rate > 0.07 && rate < 0.13, s"drop rate $rate not near 10%")
    // kept text is a subsequence of the original tokens
    val orig = docs.select("doc_id", "text").as[(Long, String)].collect().toMap
    out.take(50).foreach { case (id, aug, _, _) =>
      val o = orig(id).trim.split("\\s+").filter(_.nonEmpty).iterator
      aug.split(" ").filter(_.nonEmpty).foreach { w =>
        assert(o.contains(w), s"doc $id: '$w' out of order or absent")
      }
    }
    // deterministic rerun; a different seed produces a different corpus
    val again = TextOps.wordDropout(docs, "doc_id", "text", 10, "d1")
      .as[(Long, String, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    val other = TextOps.wordDropout(docs, "doc_id", "text", 10, "d2")
      .as[(Long, String, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq !== other.sortBy(_._1).toSeq)
    // plan is expression-only
    val plan = TextOps.wordDropout(docs, "doc_id", "text", 10, "d1")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(500))
  }

  test("renderSftTemplate: mask span extracts exactly the response") {
    val d = Seq((1L, "what is a shuffle", "a network exchange of rows"),
                (2L, "empty response", ""),
                (3L, "", "resp only")).toDF("id", "p", "r")
    val out = TextOps.renderSftTemplate(d, "id", "p", "r", "Sys prompt.")
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> t).toMap
    d.as[(Long, String, String)].collect().foreach { case (id, p, r) =>
      val (_, rendered, start, len) = out(id)
      // the mask span IS the response — substring round-trip
      assert(rendered.substring(start.toInt, (start + len).toInt) === r, s"id $id")
      // template structure: tags present, prompt before the mask
      assert(rendered.startsWith(TextOps.SftSystemTag + "Sys prompt." + TextOps.SftUserTag))
      assert(rendered.endsWith(TextOps.SftEndTag))
      assert(rendered.substring(0, start.toInt).endsWith(p + TextOps.SftAssistantTag))
    }
  }

  test("repairMojibake: strictly-gated inverse transcode") {
    def fix(s: String): String = one[String](TextOps.repairMojibake(lit(s)))
    // 2-byte repair: "é" (C3 A9) read as Latin-1 renders "Ã©"
    assert(fix("cafÃ© break") === "café break")
    // 3-byte repair: "—" (E2 80 94) renders "â" U+0080 U+0094
    assert(fix("a\u00E2\u0080\u0094b") === "a\u2014b")
    // legitimate Latin-1 is NOT valid UTF-8 → unchanged (the ftfy gate)
    assert(fix("café") === "café")
    // chars above U+00FF can't be a Latin-1 rendering → unchanged
    assert(fix("漢字 Ã©") === "漢字 Ã©")
    // pure ASCII → identity (fast path)
    assert(fix("plain ascii") === "plain ascii")
    // repair is idempotent on its own output: the repaired "é" alone is
    // not valid UTF-8 bytes, so a second pass leaves it alone
    assert(fix(fix("cafÃ©")) === "café")
    // round-trip: corrupt with the real transcode, repair restores
    val planted = "naïve … façade — café"
    import spark.implicits._
    val rt = Seq(planted).toDF("t")
      .select(TextOps.repairMojibake(
        decode(encode($"t", "UTF-8"), "ISO-8859-1")).as("r"))
      .as[String].collect()(0)
    assert(rt === planted)
    // null in, null out
    val n = Seq(1).toDF("x")
      .select(TextOps.repairMojibake(lit(null).cast("string")).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("foldAccents: composed and decomposed accents fold; ASCII fast path") {
    // composed e-acute and decomposed e + U+0301 both fold to plain e
    assert(one[String](TextOps.foldAccents(lit("caf\u00E9"))) === "cafe")
    assert(one[String](TextOps.foldAccents(lit("cafe\u0301"))) === "cafe")
    assert(one[String](TextOps.foldAccents(lit("\u00C5ngstr\u00F6m"))) === "Angstrom")
    assert(one[String](TextOps.foldAccents(lit("na\u00EFve fa\u00E7ade"))) === "naive facade")
    // supplementary-plane marks (U+1D165 Mc, U+1D167 Mn — both above
    // U+FFFF): a UTF-16 char loop would classify the surrogate halves as
    // SURROGATE and keep them; code-point iteration over all mark
    // categories (utf8proc STRIP_MARK) strips both, like DuckDB does
    assert(one[String](TextOps.foldAccents(lit("x\uD834\uDD65y"))) === "xy")
    assert(one[String](TextOps.foldAccents(lit("x\uD834\uDD67y"))) === "xy")
    // pure ASCII returns unchanged (and exercises the scan-only path)
    assert(one[String](TextOps.foldAccents(lit("plain ascii text"))) === "plain ascii text")
    // matches the JDK reference definition (all mark categories, the
    // utf8proc STRIP_MARK set) on a mixed string that includes an Mc mark
    val mixed = "r\u00E9sum\u00E9 \u00FCber\uD834\uDD65 alles"
    val expected = java.text.Normalizer
      .normalize(mixed, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
    assert(one[String](TextOps.foldAccents(lit(mixed))) ===
      java.text.Normalizer.normalize(expected, java.text.Normalizer.Form.NFC))
    val n = Seq(1).toDF("x").select(TextOps.foldAccents(lit(null).cast("string")).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse") {
    // decomposed e + U+0301 composes to single-code-point \u00E9; NFC input unchanged
    assert(one[String](TextOps.normalizeText(lit("cafe\u0301"))) === "caf\u00E9")
    assert(one[String](TextOps.normalizeText(lit("caf\u00E9"))) === "caf\u00E9")
    // A + U+030A composes to \u00C5 (not the visually-identical U+212B)
    assert(one[String](TextOps.normalizeText(lit("A\u030A"))) === "\u00C5")
    // C0 controls stripped; newline survives; tab/space runs collapse
    assert(one[String](TextOps.normalizeText(lit("a\u0007b\u001Fc"))) === "abc")
    assert(one[String](TextOps.normalizeText(lit("a\nb"))) === "a\nb")
    assert(one[String](TextOps.normalizeText(lit("a \t b"))) === "a b")
    assert(one[String](TextOps.normalizeText(lit("a   b"))) === "a b")
    // matches the JDK reference normalizer on a mixed string
    val mixed = "no\u0308el me\u0301lange\u0002  x"
    val expected = java.text.Normalizer
      .normalize(mixed, java.text.Normalizer.Form.NFC)
      .replaceAll("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
      .replaceAll("[ \\t]+", " ")
    assert(one[String](TextOps.normalizeText(lit(mixed))) === expected)
    // null passes through
    val n = Seq(1).toDF("x").select(TextOps.normalizeText(lit(null).cast("string")).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("canonicalizeUrl: case, www, default ports, tracking params, slash, fragment") {
    def c(u: String): String = one[String](TextOps.canonicalizeUrl(lit(u)))
    assert(c("HTTPS://WWW.Example.COM:443/a/?utm_source=x&b=1#frag")
      === "https://example.com/a?b=1")
    // all params tracking → query vanishes entirely
    assert(c("http://Site.org:80/p?utm_a=1&utm_b=2") === "http://site.org/p")
    // trailing slash without query
    assert(c("http://a.example/p/") === "http://a.example/p")
    // scheme-less: host case untouched (no authority to extract), params still cleaned
    assert(c("example.com/x?ref=1&keep=2") === "example.com/x?keep=2")
    // non-default port survives; path case survives
    assert(c("https://h.io:8443/Q") === "https://h.io:8443/Q")
    // tracking param mid-query; gclid
    assert(c("HTTP://HOST/Path?a=1&gclid=99&z=2") === "http://host/Path?a=1&z=2")
    // :443 on http is NOT default → kept
    assert(c("http://x.y:443/p") === "http://x.y:443/p")
    // null propagates
    val n = Seq(1).toDF("x")
      .select(TextOps.canonicalizeUrl(lit(null).cast("string")).as("r")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("stripHtml: blocks, inline tags, entities, whitespace") {
    def c(h: String) = one[String](TextOps.stripHtml(lit(h)))
    assert(c("<p>Hello</p>") === "Hello")
    // script content (including tags and multi-line body) vanishes
    assert(c("<SCRIPT a=b>var x = '<p>not text</p>';\nmore</script>after") === "after")
    assert(c("<style>h1 { color: x }</style>ok") === "ok")
    assert(c("a<!-- hidden\nlines -->b") === "ab")
    // block tags delimit lines; inline tags just disappear
    assert(c("<div>one</div><div>two</div>") === "one\ntwo")
    assert(c("x<br/>y") === "x\ny")
    assert(c("keep <span>inline</span> words") === "keep inline words")
    // entity decode, single-pass (&amp;lt; is the text "&lt;")
    assert(c("&quot;q&quot; &amp; &lt;tag&gt;&nbsp;&#39;s") === "\"q\" & <tag> 's")
    assert(c("&amp;lt; once") === "&lt; once")
    // whitespace normalization + trim
    assert(c("  a   b\t c \n\n d  ") === "a b c\nd")
    // null propagates
    val n = Seq(1).toDF("x")
      .select(TextOps.stripHtml(lit(null).cast("string")).as("r")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("spanCorrupt: splicing target spans back into input sentinels restores the doc") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, (0 until 30).map(j => s"w$j").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.spanCorrupt(docs, "doc_id", "text", maskPct = 30, seed = "t1")
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(out.length === 20)
    out.foreach { case (id, input, target, nTokens, nMasked, nSpans) =>
      assert(nTokens === 30L)
      val sentinel = "<extra_id_(\\d+)>".r
      // parse target into span map: sentinel id -> masked tokens
      val spans = if (nSpans == 0) Map.empty[Int, Seq[String]] else {
        val parts = sentinel.split(target).toSeq.map(_.trim)
        val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
        // final sentinel closes the list: ids = 0..nSpans, last part empty
        assert(ids === (0 to nSpans.toInt).toSeq, s"doc $id sentinel numbering")
        ids.dropRight(1).zip(parts.drop(1))
          .map { case (k, body) => k -> body.split(" ").toSeq }.toMap
      }
      assert(spans.values.map(_.size).sum.toLong === nMasked, s"doc $id masked count")
      // reconstruct: replace each input sentinel with its span
      val rebuilt = input.split(" ").toSeq.flatMap { tok =>
        sentinel.findFirstMatchIn(tok) match {
          case Some(m) => spans(m.group(1).toInt)
          case None    => Seq(tok)
        }
      }
      assert(rebuilt.mkString(" ") === (0 until 30).map(j => s"w$j").mkString(" "),
        s"doc $id reconstruction")
    }
    // at 30% over 600 tokens some doc must actually have a multi-token span
    assert(out.map(_._5).sum > 0, "nothing was masked at 30%")
    assert(out.exists(r => r._5 > r._6), "no run of length >= 2 across 20 docs")
  }

  test("spanCorrupt: maskPct 0 passes text through; 100 masks everything as one span") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val zero = TextOps.spanCorrupt(docs, "doc_id", "text", 0, "t1")
      .as[(Long, String, String, Long, Long, Long)].head()
    assert(zero === ((1L, "a b c d e", "", 5L, 0L, 0L)))
    val full = TextOps.spanCorrupt(docs, "doc_id", "text", 100, "t1")
      .as[(Long, String, String, Long, Long, Long)].head()
    assert(full === ((1L, "<extra_id_0>", "<extra_id_0> a b c d e <extra_id_1>", 5L, 5L, 1L)))
  }

  test("spanCorrupt: deterministic in seed; different seed moves masks") {
    val docs = Seq.tabulate(10)(i =>
      (i.toLong, (0 until 40).map(j => s"t$j").mkString(" "))).toDF("doc_id", "text")
    val a = TextOps.spanCorrupt(docs, "doc_id", "text", 15, "s1").collect().toSeq
    val b = TextOps.spanCorrupt(docs, "doc_id", "text", 15, "s1").collect().toSeq
    assert(a.map(_.toString).sorted === b.map(_.toString).sorted)
    val c = TextOps.spanCorrupt(docs, "doc_id", "text", 15, "s2")
      .as[(Long, String, String, Long, Long, Long)].collect()
    assert(c.map(_._2).toSet !== a.map(_.getString(1)).toSet, "seed must matter")
  }

  test("cdcChunks: content-defined boundaries re-synchronize after an insertion") {
    val base = (0 until 200).map(j => s"w${j % 37}x$j").mkString(" ")
    val shifted = "INSERTED " + base // one-token insertion at the front
    val df = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val got = TextOps.cdcChunks(df, "doc_id", "text", k = 3, m = 16)
      .as[(Long, Long, Long, String)].collect()
    val c1 = got.filter(_._1 == 1L).sortBy(_._2)
    val c2 = got.filter(_._1 == 2L).sortBy(_._2)
    // chunks partition each doc
    assert(c1.map(_._3).sum === 200L && c2.map(_._3).sum === 201L)
    // the CDC property: every chunk of doc 1 except its FIRST also
    // appears (same md5) in doc 2 — boundaries re-synchronized within k
    // tokens of the insertion; fixed-stride chunking shares NOTHING here
    val tail1 = c1.drop(1).map(_._4).toSet
    val md2 = c2.map(_._4).toSet
    assert(tail1.subsetOf(md2),
      s"unshared tail chunks: ${tail1.diff(md2).size} of ${tail1.size}")
    assert(c1.length > 5, "fixture must produce several chunks")
    // deterministic
    val again = TextOps.cdcChunks(df, "doc_id", "text", 3, 16)
      .as[(Long, Long, Long, String)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq === again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("foldObfuscation + blocklistHits: leet variants count as matches") {
    val df = Seq(
      (1L, "J01N the h4sh t4ble"),   // join, hash, table after folding
      (2L, "nothing to see here"),
      (3L, "$can gr0up 0rder scan")  // scan x2, group, order
    ).toDF("doc_id", "text")
    val terms = Seq("join", "hash", "scan", "table", "group", "order")
    val got = df.select(col("doc_id"),
        TextOps.blocklistHits(TextOps.foldObfuscation(col("text")), terms).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 4L))
    // folding is idempotent and word boundaries hold (no substring hits)
    val sub = df.sparkSession.range(1).select(
      TextOps.blocklistHits(lit("joinery hashed"), Seq("join", "hash")).as("n"))
      .as[Long].head()
    assert(sub === 0L, "\\b must prevent substring matches")
  }

  test("featureHashSparse matches an independent JVM md5 replay; zeros dropped") {
    import spark.implicits._
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    def expected(docs: Seq[(Long, String)], dim: Int): Set[(Long, Long, Long)] =
      docs.flatMap { case (id, text) =>
        text.trim.split("\\s+").filter(_.nonEmpty).map { t =>
          (id, h60(t) % dim, if (h60("sgn:" + t) % 2 == 1) 1L else -1L)
        }
      }.groupBy(x => (x._1, x._2)).map { case ((id, i), xs) =>
        (id, i, xs.map(_._3).sum)
      }.filter(_._3 != 0L).toSet

    val docs = Seq((1L, "alpha beta beta gamma"), (2L, "  alpha   alpha "),
      (3L, ""), (4L, "delta epsilon zeta eta theta iota"))
    val df = docs.toDF("doc_id", "text")
    for (dim <- Seq(4, 16)) {
      val got = TextOps.featureHashSparse(df, "doc_id", "text", dim)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected(docs, dim), s"dim=$dim")
      assert(got.forall(r => r._2 >= 0 && r._2 < dim))
    }
    // blank doc contributes nothing; repeated token weight magnitude = count
    val w2 = TextOps.featureHashSparse(df.filter($"doc_id" === 2L),
      "doc_id", "text", 16).as[(Long, Long, Long)].collect()
    assert(w2.length === 1 && math.abs(w2.head._3) === 2L)
  }
}
