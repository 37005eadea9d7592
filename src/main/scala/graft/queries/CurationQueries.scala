package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextOps}
import Registry.{td, tdw, tdEventsUs}

/**
 * Curation / governance registry rows (split from TextQueries, round 9 —
 * pure mechanical move, registry content unchanged): the composed
 * curation funnel + incremental admission, URL domain filtering and
 * canonicalization, SFT templating, per-source capping, Unicode
 * normalization.
 */
object CurationQueries {

  val all: Seq[(String, Q)] = Seq(
    // COMPOSED curation pipeline: normalize (l47) -> learned quality gate
    // (l46) -> md5 keep-first dedup (l1 family) -> per-source funnel
    // report. The operators prove they compose; the oracle is the same
    // CTE chain end to end and stays exact
    // COMPOSED incremental ingest admission — the streaming foreachBatch
    // tail (Curation.admitIncrement) run as a batch: normalize (l47) →
    // streaming-safe gate (l46 micros scorer) over the doc_id%10=0 new
    // batch → l56 incremental-dedup verdicts vs the standing corpus,
    // mapped to admitted / rejected_quality / exact_dup / near_dup.
    // Portable family + the oracle's normalize+gate+banded CTE chain
    // make the whole composition exact end to end
    "l60_admit_increment" -> Q(
      (s, dir) => {
        val model = graft.llm.QualityClassifier.DefaultModel
        val minLogit = model.bias.add(new java.math.BigDecimal("0.050000"))
        val docs = tdw(s, dir, "documents")
        val norm = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), TextOps.normalizeText(col("text")).as("norm"))
        val gated = graft.llm.QualityClassifier.scoreStreamable(
            norm, "doc_id", "norm", model, minLogit, carry = Seq("norm"))
          .withColumnRenamed("id", "doc_id")
        graft.llm.Curation.admitIncrement(gated,
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          family = graft.llm.PortableFamily)
      },
      Some(ClassifierOracles.admitIncrementSql(
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000")),
        mod = 10))),

    "l51_curation_funnel" -> Q(
      (s, dir) => graft.llm.Curation.curationFunnel(
        td(s, dir, "documents"), "doc_id", "text", "source",
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))),
      Some(ClassifierOracles.curationFunnelSql(
        graft.llm.QualityClassifier.DefaultModel,
        minLogit = graft.llm.QualityClassifier.DefaultModel.bias
          .add(new java.math.BigDecimal("0.050000"))))),

    // domain-level URL filtering: synthetic doc_id-keyed URLs (l26
    // pattern), hosts extracted with a Java∩RE2 regex, aggregated per
    // domain with a blocklist flag — the corpus-curation step that drops
    // ad/tracker/spam domains wholesale
    "l50_url_domain_filter" -> Q(
      (s, dir) => {
        val doms = array(lit("ads.example.com"), lit("docs.example.org"),
          lit("spam.click.net"), lit("data.example.io"),
          lit("tracker.bad.site"), lit("wiki.example.edu"))
        val aug = concat(col("text"),
          lit(" see https://"), element_at(doms, (col("doc_id") % 6).cast("int") + 1),
          lit("/p/"), col("doc_id").cast("string"),
          when(col("doc_id") % 3 === 0, lit(" and http://mirror.example.net/x"))
            .otherwise(lit("")))
        td(s, dir, "documents")
          .select(col("doc_id"),
            explode(graft.llm.TextOps.extractUrlDomains(aug)).as("domain"))
          .groupBy("domain")
          .agg(countDistinct(col("doc_id")).as("n_docs"), count(lit(1)).as("n_urls"))
          .withColumn("blocked", col("domain")
            .isin("spam.click.net", "tracker.bad.site"))
      },
      Some("""WITH aug AS (
             |  SELECT doc_id, text || ' see https://' ||
             |    CASE CAST(doc_id % 6 AS INTEGER)
             |      WHEN 0 THEN 'ads.example.com' WHEN 1 THEN 'docs.example.org'
             |      WHEN 2 THEN 'spam.click.net' WHEN 3 THEN 'data.example.io'
             |      WHEN 4 THEN 'tracker.bad.site' ELSE 'wiki.example.edu' END
             |    || '/p/' || CAST(doc_id AS VARCHAR) ||
             |    CASE WHEN doc_id % 3 = 0 THEN ' and http://mirror.example.net/x' ELSE '' END AS t
             |  FROM documents),
             |d AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1)) AS domain
             |  FROM aug)
             |SELECT domain, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_urls,
             |  domain IN ('spam.click.net', 'tracker.bad.site') AS blocked
             |FROM d GROUP BY 1""".stripMargin)),

    // URL canonicalization + canonical-URL dedup: synthetic doc_id-keyed
    // URLs with case noise, www/default-port variants, tracking params,
    // optional trailing slash + fragment; canonical groups collapse the
    // crawl-variant dimensions (case, :443/:80, utm/fbclid, slash, #frag)
    // while keeping the real `id=` param — the pre-text-dedup URL step.
    // The oracle replays the synth AND the whole regex chain verbatim
    "l62_url_canonicalize" -> Q(
      (s, dir) => {
        val d = col("doc_id")
        val url = concat(
          when(d % 3 === 0, lit("HTTPS")).otherwise(lit("http")), lit("://"),
          when(d % 2 === 0, lit("WWW.")).otherwise(lit("")),
          lit("Example"), (d % 10).cast("string"), lit(".COM"),
          when(d % 3 === 0, lit(":443"))
            .when(d % 3 === 1, lit(":80")).otherwise(lit("")),
          lit("/Path/"), (d % 20).cast("string"),
          when(d % 4 === 0, lit("/")).otherwise(lit("")),
          lit("?utm_source=feed&id="), (d % 5).cast("string"),
          lit("&fbclid=x"), d.cast("string"),
          when(d % 6 === 0, lit("#Sec")).otherwise(lit("")))
        td(s, dir, "documents")
          .select(d, TextOps.canonicalizeUrl(url).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).cast("long").as("n_urls"),
            min(col("doc_id")).as("keep_doc"))
      },
      Some("""WITH u0 AS (SELECT doc_id,
             |  (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
             |  (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
             |  'Example' || CAST(doc_id % 10 AS VARCHAR) || '.COM' ||
             |  (CASE WHEN doc_id % 3 = 0 THEN ':443'
             |        WHEN doc_id % 3 = 1 THEN ':80' ELSE '' END) ||
             |  '/Path/' || CAST(doc_id % 20 AS VARCHAR) ||
             |  (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
             |  '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR) ||
             |  '&fbclid=x' || CAST(doc_id AS VARCHAR) ||
             |  (CASE WHEN doc_id % 6 = 0 THEN '#Sec' ELSE '' END) AS url
             |  FROM documents),
             |f AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u0),
             |sp AS (SELECT doc_id, u,
             |  regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1) AS sh FROM f),
             |lc AS (SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(lower(sh), '^([a-z][a-z0-9+.-]*://)www\.', '\1'),
             |      '^(http://.*):80$', '\1'),
             |    '^(https://.*):443$', '\1') AS sh2,
             |  regexp_replace(substr(u, length(sh)+1),
             |    '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|ref_src)=[^&#]*',
             |    '\1', 'g') AS r1
             |  FROM sp),
             |c AS (SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(sh2 || r1, '(\?|&)&+', '\1', 'g'),
             |        '/\?', '?'),
             |      '[?&]+$', ''),
             |    '/$', '') AS canonical_url
             |  FROM lc)
             |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_urls,
             |  CAST(min(doc_id) AS BIGINT) AS keep_doc
             |FROM c GROUP BY 1""".stripMargin)),

    // SFT chat-template rendering with the loss-mask span: fixture docs
    // become (prompt = first 8 tokens, response = rest); the compared
    // columns are the rendered-string md5 (l29 pattern) plus the EXACT
    // code-point mask offsets SFT loss depends on
    "l49_sft_template" -> Q(
      (s, dir) => {
        val tk = split(trim(col("text")), "\\s+")
        val d = td(s, dir, "documents").select(col("doc_id"),
          array_join(slice(tk, 1, 8), " ").as("prompt"),
          array_join(slice(tk, 9, 1 << 20), " ").as("resp"))
        graft.llm.TextOps.renderSftTemplate(
            d, "doc_id", "prompt", "resp", "You are a helpful assistant.")
          .select(col("id").as("doc_id"), md5(col("rendered")).as("rendered_md5"),
            col("mask_start"), col("mask_len"))
      },
      Some(TextOracles.sftTemplateSql("You are a helpful assistant."))),

    // per-source cap: at most 15 docs per source, hash-chosen — the
    // C4-style "don't let one over-crawled site dominate the mix" ceiling;
    // one exchange on source + per-group sort, engine-reproducible
    "l48_source_cap" -> Q(
      (s, dir) => graft.llm.Sampling.capPerGroup(
        td(s, dir, "documents"), "doc_id", "source", maxPerGroup = 15),
      Some("""WITH h AS (SELECT doc_id, source,
             |    ('0x'||substr(md5('c1' || chr(31) || CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hv
             |  FROM documents)
             |SELECT doc_id, source, pos FROM (
             |  SELECT doc_id, source,
             |    CAST(row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS BIGINT) AS pos
             |  FROM h) WHERE pos <= 15""".stripMargin)),

    // Unicode ingestion normalization: NFC composition (native codegen'd
    // expression — Spark has no built-in) + control strip + whitespace
    // collapse. Fixture text is clean ASCII, so the row augments it with
    // doc_id-keyed decomposed/control/clean tails (the l26 pattern) to
    // exercise every path; the oracle replays via DuckDB nfc_normalize
    // l121 — code-vs-prose detection (graft/llm/CodeDetect.scala): the
    // source-mix classifier run before per-domain sampling weights — code
    // and prose want different dedup thresholds and mixture temperatures.
    // Exact integer signals (syntax-char count, word-boundary keyword
    // hits, micro-unit symbol density), expression-only, zero shuffles.
    // Fixture: docs are word salad with no syntax chars, so doc_id%5∈{0,1}
    // slices are deterministically rewritten into def-function / JSON
    // shapes on BOTH sides (the c16 fixture-rotation pattern) — the code
    // lanes must flag, the prose lane must not.
    "l121_code_prose_detect" -> Q(
      (s, dir) => {
        val d = td(s, dir, "documents").filter(col("text").isNotNull)
        val id = col("doc_id").cast("string")
        val aug = d.select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(lit("def f_"), id, lit("(x): return x + "), id,
              lit(" # "), substring(col("text"), 1, 40)))
          .when(col("doc_id") % 5 === 1,
            concat(lit("{ \"k\": ["), id, lit("], \"v\": \""),
              substring(col("text"), 1, 40), lit("\" }")))
          .otherwise(col("text")).as("text"))
        graft.llm.CodeDetect.signals(aug, "doc_id", "text")
      },
      Some("""WITH a AS (SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN 'def f_' || CAST(doc_id AS VARCHAR)
             |           || '(x): return x + ' || CAST(doc_id AS VARCHAR)
             |           || ' # ' || substr(text, 1, 40)
             |         WHEN doc_id % 5 = 1 THEN '{ "k": [' || CAST(doc_id AS VARCHAR)
             |           || '], "v": "' || substr(text, 1, 40) || '" }'
             |         ELSE text END AS text
             |  FROM documents WHERE text IS NOT NULL),
             |s AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             |    CAST(length(text) - length(regexp_replace(text, '[;{}()=\[\]<>:#]', '', 'g')) AS BIGINT) AS n_sym,
             |    CAST(len(regexp_extract_all(text,
             |      '\b(def|return|if|else|for|while|class|import|var|const)\b', 1)) AS BIGINT) AS n_kw
             |  FROM a)
             |SELECT doc_id, n_chars, n_sym, n_kw,
             |  CAST(CASE WHEN n_chars = 0 THEN 0
             |    ELSE (n_sym * 1000000) // n_chars END AS BIGINT) AS sym_micro,
             |  ((CASE WHEN n_chars = 0 THEN 0
             |    ELSE (n_sym * 1000000) // n_chars END) >= 20000 OR n_kw >= 2) AS is_code
             |FROM s""".stripMargin)),

    "l47_unicode_normalize" -> Q(
      (s, dir) => {
        val suffix = element_at(array(
          lit("cafe\u0301 touche\u0301"),
          lit("A\u030Angstro\u0308m"),
          lit("bad\u0007ctl\u001Ftail"),
          lit("plain tail")), (col("doc_id") % 4).cast("int") + 1)
        val raw = concat_ws(" ", col("text"), suffix)
        td(s, dir, "documents")
          .select(col("doc_id"), raw.as("_raw"))
          .withColumn("norm_text", graft.llm.TextOps.normalizeText(col("_raw")))
          .select(col("doc_id"), col("norm_text"),
            (col("norm_text") =!= col("_raw")).as("changed"))
      },
      Some(TextOracles.normalizeTextSql)),

    // leakage-safe split (Sampling.leakageSafeSplit): train/val/test
    // buckets hashed from the CONTENT fingerprint, so byte-identical
    // docs can never straddle splits (the eval-inflation hole l59
    // audits; this constructor closes it for exact dups). Oracle replays
    // the l8p fingerprint fold + the seeded bucket hash
    "l110_leakage_safe_split" -> Q(
      (s, dir) => graft.llm.Sampling.leakageSafeSplit(
        td(s, dir, "documents"), "doc_id", "text", trainPct = 90, valPct = 5),
      Some("""WITH RECURSIVE toks AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
             |  FROM documents WHERE text IS NOT NULL),
             |f(doc_id, i, acc) AS (
             |  SELECT doc_id, 0, CAST(0 AS BIGINT) FROM toks
             |  UNION ALL
             |  SELECT f.doc_id, f.i + 1,
             |    (f.acc*8191 + ('0x'||substr(md5(t[f.i+1]),1,15))::BIGINT) % 2147483647
             |  FROM f JOIN toks USING (doc_id) WHERE f.i < len(t)),
             |fp AS (SELECT f.doc_id, f.acc AS fingerprint
             |  FROM f JOIN toks USING (doc_id) WHERE f.i = len(t)),
             |b AS (SELECT doc_id, fingerprint,
             |    ('0x'||substr(md5('sp1' || chr(31) || CAST(fingerprint AS VARCHAR)),1,15))::BIGINT
             |      % 100 AS bk
             |  FROM fp)
             |SELECT doc_id, fingerprint,
             |  CASE WHEN bk < 90 THEN 'train' WHEN bk < 95 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM b""".stripMargin)),
  )
}
