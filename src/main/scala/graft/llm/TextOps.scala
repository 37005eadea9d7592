package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, language-ID heuristics, quality scoring, fingerprinting. All are
 * expression-only `Column` functions (whole-stage codegen; no UDFs) so they
 * survive a 100 TB scan untouched.
 *
 * These extend the reference's normalization layer (cda_bq_etl/
 * data_helpers.py:447-486) to the LLM-pipeline surface required by the
 * engine's north star; no direct reference counterpart exists.
 */
object TextOps extends TextTransforms {

  /** Whitespace tokenizer: `split` on runs of whitespace after trim. */
  def whitespaceTokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Whitespace token count. Empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(whitespaceTokens(text)).cast("long"))

  /**
   * BPE-ish subword unit count: letter runs, digit runs, and single
   * non-alnum marks each count as one unit — a cheap, deterministic proxy
   * for BPE token counts (ratio ≈ const per language).
   */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Tiny per-language stopword inventories for the lang-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"))

  /** Count of tokens that are stopwords of `lang` (lowercased match). */
  def stopwordHits(text: Column, lang: String): Column = {
    val sw = Stopwords(lang).map(lit(_))
    size(filter(whitespaceTokens(lower(text)), t => array_contains(array(sw: _*), t))).cast("long")
  }

  /**
   * N-gram-free language-ID heuristic: argmax over per-language stopword hit
   * counts; "und" (undetermined) when no language scores a hit. Deterministic
   * tie-break by language code order.
   */
  def langIdHeuristic(text: Column): Column = {
    val langs = Stopwords.keys.toSeq.sorted
    val scored = langs.map(l => struct(stopwordHits(text, l).as("hits"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Punctuation character count (non-alnum, non-space). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))).cast("long")

  /**
   * Quality score in [0,1]: penalizes very short docs, high punctuation
   * ratio, and low mean word length. Rounded to 6 dp for cross-engine
   * hash stability.
   */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = tokenCount(text).cast("double")
    val lenScore   = least(nChars / lit(200.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val meanWord   = nChars / greatest(nWords, lit(1.0))
    val wordScore  = least(meanWord / lit(8.0), lit(1.0))
    round(lenScore * (lit(1.0) - punctRatio) * (lit(0.5) + lit(0.5) * wordScore), 6)
  }

  /** RE2-compatible (works in Spark's Java regex AND DuckDB) PII patterns:
    * no lookarounds, no backrefs — the portable subset. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  /**
   * PII scrubbing: emails → `<EMAIL>` then phone-like digit runs →
   * `<PHONE>` (order fixed — scrubbing emails first keeps their digits
   * from feeding the phone matcher). Expression-only, codegen'd; the
   * patterns are deliberately in the Java∩RE2 subset so an external
   * engine applies the identical transform.
   */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of PII matches (emails + phone runs) in the RAW text. */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(PhonePattern), lit(0)))).cast("long")

  /** Control characters a text pipeline strips: C0 except tab/newline
    * (\x09, \x0A) and CR (\x0D), plus DEL. Java∩RE2 subset. */
  private[llm] val ControlCharPattern = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** URL host matcher, Java∩RE2 subset: scheme + captured host. */
  private[llm] val UrlHostPattern = "https?://([A-Za-z0-9.-]+)"

  /** Hosts of every http(s) URL in the text, in order (empty array when
    * none) — the per-doc half of domain-level filtering: corpus curation
    * blocks by DOMAIN (ad/tracker/spam lists), not by full URL. */
  def extractUrlDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlHostPattern), lit(1))

  /**
   * HTML → text extraction (the crawl-ingestion step BEFORE any text
   * operator runs — raw web documents arrive as markup): a fixed,
   * documented chain —
   *   1. drop `<script>`/`<style>` blocks wholesale (code/CSS is not
   *      training text) and `<!-- comments -->`;
   *   2. block-level tags (`p div br li tr h1..h6`) become newlines so
   *      document line structure survives for the line-level operators
   *      ([[graft.llm.Dedup.lineDedup]] works on exactly these lines);
   *   3. every remaining tag is stripped;
   *   4. the fixed entity set `&nbsp; &lt; &gt; &quot; &#39; &amp;`
   *      decodes, `&amp;` LAST (single-pass decode — `&amp;lt;` is the
   *      TEXT "&lt;", not a double-decode);
   *   5. whitespace normalizes: runs of spaces/tabs/CRs to one space,
   *      spaces hugging newlines dropped, newline runs collapsed,
   *      leading/trailing newlines then spaces removed (plain `trim` —
   *      identical space-only semantics in both engines).
   * Every step is a Java∩RE2 regex (`(?is)` inline flags, non-greedy
   * blocks, NO lookaround), so a DuckDB oracle replays the chain
   * verbatim. Expression-only — zero shuffles. This is the regex
   * fast-path extractor (trafilatura-class DOM scoring needs a parser,
   * which belongs behind the same seam as the media codecs).
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      "(?i)</?(p|div|br|li|tr|h[1-6])\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    val sp = regexp_replace(ent, "[ \\t\\r]+", " ")
    val hug = regexp_replace(sp, " ?\\n ?", "\n")
    val runs = regexp_replace(hug, "\\n+", "\n")
    trim(regexp_replace(runs, "^\\n+|\\n+$", ""))
  }

  /**
   * URL canonicalization for URL-level dedup (the same page crawled five
   * ways must collapse BEFORE text dedup ever runs): a fixed, documented
   * normal form —
   *   1. drop the `#fragment`;
   *   2. lowercase scheme + host (path/query case is significant, host
   *      case is not — RFC 3986 §6.2.2.1);
   *   3. drop a leading `www.`;
   *   4. drop the scheme-default port (`http…:80`, `https…:443`);
   *   5. remove tracking params (`utm_*`, `gclid`, `fbclid`, `msclkid`,
   *      `ref`, `ref_src`) wherever they sit in the query string, then
   *      collapse the separators they leave behind;
   *   6. drop a trailing `/` (also before `?`).
   * Every step is a Java∩RE2 regex (no lookaround — RE2 has none), so a
   * DuckDB oracle replays the chain verbatim. Expression-only: zero
   * shuffles; canonical keys feed [[graft.llm.Dedup.exactDedup]] /
   * [[graft.llm.Dedup.exactDedupKeepBest]] directly.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val sh = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = noFrag.substr(length(sh) + lit(1), length(noFrag))
    val shNoWww = regexp_replace(lower(sh), "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val shNoPort = regexp_replace(
      regexp_replace(shNoWww, "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val restNoTrack = regexp_replace(rest,
      "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|ref_src)=[^&#]*", "$1")
    val c1 = regexp_replace(concat(shNoPort, restNoTrack), "(\\?|&)&+", "$1")
    val c2 = regexp_replace(c1, "/\\?", "?")
    val c3 = regexp_replace(c2, "[?&]+$", "")
    regexp_replace(c3, "/$", "")
  }

  /** Accent-folded search key: native [[StripAccentsExpr]] (NFD → drop
    * all mark categories Mn/Mc/Me → NFC), the DuckDB-`strip_accents`
    * transform — the normalization matching/search keys use so "café"
    * joins "cafe". */
  def foldAccents(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(StripAccentsExpr(expression(text)))
  }

  /** Mojibake repair (ftfy `fix_encoding` core): undo UTF-8-read-as-Latin-1
    * double encoding via the native strictly-gated [[MojibakeRepairExpr]] —
    * "Ã©" → "é", "â€¦"-style runs → "…"; legitimate Latin-1 ("café") and
    * non-Latin-1 text pass through unchanged. */
  def repairMojibake(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(MojibakeRepairExpr(expression(text)))
  }

  /** Leetspeak/homoglyph substitution map for [[foldObfuscation]] — fixed,
    * shared with the generated oracle (DuckDB `translate` applies the
    * identical 1:1 map). Digits/symbols → the letters they impersonate. */
  val LeetFrom = "0134578@$!"
  val LeetTo   = "oieastbasi"

  /**
   * Obfuscation folding for blocklist matching: lowercase, then fold the
   * standard leet/symbol substitutions (`h4sh` → `hash`, `j0!n` → `join`).
   * A word-boundary blocklist regex alone misses trivially-obfuscated
   * terms — spam/abuse filtering folds FIRST, matches SECOND (the
   * canonical-form trick of [[canonicalizeUrl]] applied to content
   * policy). Expression-only (`translate` is codegen'd), zero shuffles;
   * `translate` is in the portable Spark∩DuckDB surface so the fold
   * replays exactly.
   */
  def foldObfuscation(text: Column): Column =
    translate(lower(text), LeetFrom, LeetTo)

  /**
   * Count blocklist-term hits in folded text — word-boundary matches
   * (`\b` is RE2∩Java), summed over terms. Terms must be lowercase
   * letters only (they become regex literals).
   */
  def blocklistHits(folded: Column, terms: Seq[String]): Column = {
    require(terms.nonEmpty && terms.forall(_.matches("[a-z]+")),
      "blocklist terms must be nonempty lowercase words")
    terms.map(t => regexp_count(folded, lit("\\b" + t + "\\b")))
      .reduce(_ + _).cast("long")
  }

  /**
   * Text normalization for ingestion: Unicode NFC composition (native
   * [[NfcNormalizeExpr]] — combining sequences from legacy encoders
   * compose to canonical form, so "e"+U+0301 and "é" dedup/tokenize the
   * same), then strip C0 control characters (keeping tab/newline/CR),
   * then collapse space/tab runs to one space. Expression-only — zero
   * shuffles; the regex steps are in the Java∩RE2 subset so an external
   * engine (DuckDB `nfc_normalize` + `regexp_replace`) applies the
   * identical transform.
   */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    val nfc = column(NfcNormalizeExpr(expression(text)))
    regexp_replace(regexp_replace(nfc, ControlCharPattern, ""), "[ \\t]+", " ")
  }

  /** Word n-gram shingles of size n (contiguous, space-joined). Docs with
    * fewer than n tokens yield an EMPTY array — the guard matters because
    * `sequence(1, 0)` is the DESCENDING [1, 0] in Spark (step defaults to
    * -1 when start > stop), which would emit two bogus shingles. */
  def shingles(text: Column, n: Int): Column = {
    val toks = whitespaceTokens(lower(text))
    if (n == 1) toks  // 1-gram shingles ARE the tokens (space-join of a 1-slice)
    else {
      // Let-bind the token array via a 1-element transform: `toks` inlined
      // directly into the inner lambda would re-run the regex split for
      // EVERY shingle (O(tokens²) tokenizations per doc); as a bound lambda
      // variable it is evaluated once and slices are O(n) pointer copies.
      val perDoc = transform(array(toks), tk => {
        val count = size(tk) - (n - 1)
        when(count < 1, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), count),
            i => array_join(slice(tk, i, lit(n)), " ")))
      })
      get(perDoc, lit(0))
    }
  }

  /** Per-token xxhash64 array — materialize this as a column BEFORE calling
    * [[shingleHashesFromTokenHashes]], or every element access re-evaluates
    * the whole transform (quadratic blowup). */
  def tokenHashes(text: Column): Column =
    transform(whitespaceTokens(lower(text)), t => xxhash64(t))

  /**
   * Hashed word n-gram shingles composed from a MATERIALIZED token-hash
   * array column: each shingle hash mixes the n token hashes — no
   * shingle-string allocation. The canonical representation for
   * MinHash/Jaccard pipelines at scale (collision probability ~2⁻⁶⁴ per
   * pair is negligible next to MinHash's own approximation error).
   */
  def shingleHashesFromTokenHashes(th: Column, n: Int): Column = {
    val count = size(th) - (n - 1)
    when(count < 1, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), count),
        i => xxhash64((0 until n).map(j => get(th, i + lit(j) - 1)): _*)))
  }

  /**
   * Portable 60-bit string hash: the first 15 hex chars of md5, parsed as
   * an integer. Slower than xxhash64 but exactly reproducible in any SQL
   * engine (`('0x'||substr(md5(s),1,15))::BIGINT` in DuckDB) — used by
   * [[graft.llm.PortableFamily]] so the whole LSH pipeline can be
   * oracle-checked end-to-end. Computed by the native [[PortableHash60Expr]]
   * (direct digest + nibble parse); [[portableHash60Sql]] is the
   * expression-composed definition it is parity-tested against.
   */
  def portableHash60(s: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(PortableHash60Expr(expression(s)))
  }

  /** Expression-composed twin of [[portableHash60]] (hex string + `conv`) —
    * kept as the independent definition the native expression is tested
    * against. */
  private[llm] def portableHash60Sql(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /**
   * Rolling fingerprint over whitespace tokens: a left-fold hash chain
   * (acc, token) → xxhash64(acc, token). Order-sensitive, unlike a
   * bag-of-words hash, and overflow-free under ANSI mode (a raw polynomial
   * `acc*31+h` would throw ARITHMETIC_OVERFLOW).
   */
  def docFingerprint(text: Column): Column =
    aggregate(whitespaceTokens(text), lit(0L),
      (acc, t) => xxhash64(acc, t))

  /**
   * Portable twin of [[docFingerprint]]: the same order-sensitive left-fold
   * chain, but with SQL-reproducible arithmetic — acc = (acc·8191 +
   * [[portableHash60]](token)) mod P, P = 2³¹−1. Products stay < 2⁶²
   * (acc < 2³¹, hash < 2⁶⁰), safe under ANSI long math. A DuckDB
   * recursive CTE replays the identical fold, giving the fingerprint
   * family an exact external oracle.
   */
  def portableDocFingerprint(text: Column): Column = {
    val P = graft.llm.PortableFamily.P
    aggregate(whitespaceTokens(text), lit(0L),
      (acc, t) => (acc * lit(8191L) + portableHash60(t)) % lit(P))
  }
}
