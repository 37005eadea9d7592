package graft.queries

/**
 * DuckDB oracle SQL for the BPE tokenizer ([[graft.llm.Bpe]]): a recursive
 * CTE replays the IDENTICAL greedy lowest-rank single-occurrence merge
 * loop over every distinct word, with the merges table interpolated from
 * the same Scala values the Spark expression carries — both engines encode
 * from the same spec, end to end.
 *
 * Mechanics verified against DuckDB 1.0 semantics: string slicing is
 * code-point-based (matches the Scala encoder's codePoints), and
 * `list_position` returns 0 when absent — `nullif(…, 0)` maps absence to
 * NULL (so it can never masquerade as a found pair), and the candidate key
 * is `rank·10⁶ + position` with `list_min` picking (lowest rank, then
 * leftmost) among the non-NULL candidates. All-pairs recursion depth is
 * bounded by word length (each step removes one symbol).
 */
/** Shared SQL-literal escaping for the oracle builders — one definition so
  * a quoting fix can never reach only one generator. */
private[queries] object OracleSqlUtil {
  def esc(s: String): String = s.replace("'", "''")
}

object BpeOracles {

  private def esc(s: String): String = OracleSqlUtil.esc(s)

  /** `['a b', ...]` in rank order, pair symbols joined by a single space —
    * the same separator as `BpeTable.Sep`. Symbols come from
    * whitespace-split words, so they provably cannot contain a space and
    * the composite key is exact pair lookup (chr(1) was NOT safe here:
    * \\x01 is not whitespace, so a corpus word could carry it into trained
    * symbols and collide composite keys). */
  private def mergeListSql(merges: Seq[(String, String)]): String =
    merges.map { case (a, b) => s"'${esc(a)} ${esc(b)}'" }
      .mkString("[", ", ", "]")

  /** Lowest-rank-then-leftmost mergeable pair of symbol list `s` against
    * merge list `m`, as `rank·10⁶ + position` (NULL when none).
    * `list_position` returns 0 when absent; `nullif` maps that to NULL so
    * an absent pair can NEVER masquerade as a found one (a bare `x >= K`
    * filter on `0·K + i` would re-admit positions ≥ K in pathologically
    * long words); the 10⁶ stride keeps (rank, position) ordering exact for
    * words up to 10⁶ code points. */
  private def pickSql(s: String): String =
    s"""list_min(list_filter(list_transform(range(1, len($s)),
       |    i -> nullif(list_position(m, $s[i] || ' ' || $s[i+1]), 0) * 1000000 + i),
       |  x -> x IS NOT NULL))""".stripMargin

  /** Shared recursive-encode CTE block ending in `wc(w, syms)` — final
    * symbol lists per distinct word — plus `tok(doc_id, w, pos)` with
    * in-document word positions (parallel unnests zip row-wise). */
  private[queries] def encodeCtes(merges: Seq[(String, String)]): String =
    s"""ml AS (SELECT ${mergeListSql(merges)} AS m),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
       |  FROM documents WHERE text IS NOT NULL),
       |tok AS (SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS pos FROM toks),
       |words AS (SELECT DISTINCT w FROM tok),
       |enc(w, syms, best) AS (
       |  SELECT w, syms, ${pickSql("syms")}
       |  FROM (SELECT w, list_transform(range(1, length(w)+1), i -> w[i:i]) AS syms
       |        FROM words), ml
       |  UNION ALL
       |  SELECT w, ns, ${pickSql("ns")}
       |  FROM (SELECT w, syms[1:(best % 1000000)-1] ||
       |          [syms[best % 1000000] || syms[(best % 1000000)+1]] ||
       |          syms[(best % 1000000)+2:] AS ns
       |        FROM enc WHERE best IS NOT NULL), ml),
       |wc AS (SELECT w, syms FROM enc WHERE best IS NULL)""".stripMargin
  // NB: this block is re-interpolated into an outer .stripMargin template —
  // continuation lines must never start with whitespace + '|', or the outer
  // strip eats one pipe of a '||' operator

  /** Exact twin of `Bpe.encodeTokens(col("text"), merges)` over the
    * `documents` table: (doc_id, bpe_text) — every word's final tokens
    * re-assembled in document order, space-joined. */
  def encodeSql(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(merges)},
       |asm AS (
       |  SELECT t.doc_id, string_agg(array_to_string(wc.syms, ' '), ' ' ORDER BY t.pos) AS s
       |  FROM tok t JOIN wc USING (w) WHERE len(wc.syms) > 0 GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(a.s, '') END AS bpe_text
       |FROM documents d LEFT JOIN asm a USING (doc_id)""".stripMargin

  /** Twin of the l35 round-trip audit: the tokenizer is LOSSLESS iff
    * stripping the token separator from the encoding reproduces the
    * whitespace-collapsed source (tokens never contain whitespace, words
    * partition into symbols). The oracle recomputes the encoding via the
    * same recursive CTE and counts mismatches independently — expected
    * (n_docs, 0). */
  def roundTripSql(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(merges)},
       |asm AS (
       |  SELECT t.doc_id, string_agg(array_to_string(wc.syms, ' '), ' ' ORDER BY t.pos) AS s
       |  FROM tok t JOIN wc USING (w) WHERE len(wc.syms) > 0 GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN replace(COALESCE(a.s, ''), ' ', '')
       |      <> regexp_replace(trim(d.text), '\\s+', '', 'g') THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_mismatch
       |FROM documents d LEFT JOIN asm a USING (doc_id)
       |WHERE d.text IS NOT NULL""".stripMargin

  /** Exact twin of `Bpe.countTokens(col("text"), merges)` over the
    * `documents` table: (doc_id, bpe_tokens). Builds on the SAME
    * [[encodeCtes]] block as [[encodeSql]] — one hand-maintained copy of
    * the recursive merge replay, so a fix there can never desynchronize
    * the count oracle from the encode oracle. */
  def tokenCountSql(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(merges)},
       |cnt AS (SELECT t.doc_id, SUM(len(wc.syms)) AS n
       |        FROM tok t JOIN wc USING (w) GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN d.text IS NULL THEN NULL
       |       ELSE CAST(COALESCE(c.n, 0) AS BIGINT) END AS bpe_tokens
       |FROM documents d LEFT JOIN cnt c USING (doc_id)""".stripMargin

  /** Exact twin of the l77 fertility query: per-language BPE
    * tokens-per-word and chars-per-token from exact integer sums (the
    * only doubles are the two final divisions, identical in both
    * engines; nullif guards a zero denominator). */
  def fertilitySql(merges: Seq[(String, String)]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(merges)},
       |cnt AS (SELECT t.doc_id, SUM(len(wc.syms)) AS n
       |        FROM tok t JOIN wc USING (w) GROUP BY 1),
       |base AS (SELECT d.lang,
       |    CAST(COALESCE(c.n, 0) AS BIGINT) AS bpe,
       |    CAST(CASE WHEN length(trim(d.text)) = 0 THEN 0
       |      ELSE len(regexp_split_to_array(trim(d.text), '\\s+')) END AS BIGINT) AS words,
       |    CAST(length(d.text) AS BIGINT) AS chars
       |  FROM documents d LEFT JOIN cnt c USING (doc_id)
       |  WHERE d.text IS NOT NULL)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(words) AS BIGINT) AS n_words,
       |  CAST(sum(chars) AS BIGINT) AS n_chars,
       |  round(CAST(sum(bpe) AS DOUBLE) / CAST(nullif(sum(words), 0) AS DOUBLE), 6) AS tokens_per_word,
       |  round(CAST(sum(chars) AS DOUBLE) / CAST(nullif(sum(bpe), 0) AS DOUBLE), 6) AS chars_per_token
       |FROM base GROUP BY 1""".stripMargin

  /** Exact twin of the l22 vocab-stats query: token frequencies over the
    * full BPE-encoded corpus, top `k` by (count desc, token asc). */
  def vocabStatsSql(merges: Seq[(String, String)], k: Int): String =
    s"""WITH RECURSIVE
       |${encodeCtes(merges)},
       |toka AS (SELECT unnest(wc.syms) AS token FROM tok t JOIN wc USING (w)),
       |g AS (SELECT token, CAST(count(*) AS BIGINT) AS n FROM toka GROUP BY 1)
       |SELECT token, n FROM g ORDER BY n DESC, token LIMIT $k""".stripMargin

  /** Shared packing CTE body: [[encodeCtes]] + counts + the per-chunk
    * greedy fold recursion, ending in `rec(chunk, rn, doc_id, n, bin,
    * running)`. */
  private def packedCtes(merges: Seq[(String, String)], binCapacity: Long,
                         chunkSize: Long): String =
    s"""${encodeCtes(merges)},
       |cnt AS (SELECT t.doc_id, SUM(len(wc.syms)) AS n
       |        FROM tok t JOIN wc USING (w) GROUP BY 1),
       |nn AS (SELECT d.doc_id, COALESCE(c.n, 0) AS n
       |       FROM documents d LEFT JOIN cnt c USING (doc_id)
       |       WHERE d.text IS NOT NULL),
       |seq AS (SELECT doc_id, doc_id // $chunkSize AS chunk, n,
       |        row_number() OVER (PARTITION BY doc_id // $chunkSize ORDER BY doc_id) AS rn
       |        FROM nn),
       |rec(chunk, rn, doc_id, n, bin, running) AS (
       |  SELECT chunk, rn, doc_id, n, CAST(0 AS BIGINT), n FROM seq WHERE rn = 1
       |  UNION ALL
       |  SELECT s.chunk, s.rn, s.doc_id, s.n,
       |    CASE WHEN r.running > 0 AND r.running + s.n > $binCapacity
       |         THEN r.bin + 1 ELSE r.bin END,
       |    CASE WHEN r.running > 0 AND r.running + s.n > $binCapacity
       |         THEN s.n ELSE r.running + s.n END
       |  FROM rec r JOIN seq s ON s.chunk = r.chunk AND s.rn = r.rn + 1)""".stripMargin

  /** Exact twin of `Packing.packTextByTokenBudget` over `documents`: the
    * identical greedy first-fit-in-order fold replayed per chunk by a
    * linear recursive CTE over the chunk-local row number (all chunks
    * advance in parallel per recursion step; depth = chunk doc count). */
  def packingSql(merges: Seq[(String, String)], binCapacity: Long,
                 chunkSize: Long): String =
    s"""WITH RECURSIVE
       |${packedCtes(merges, binCapacity, chunkSize)}
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(chunk AS BIGINT) AS chunk,
       |  CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_tokens
       |FROM rec""".stripMargin

  /**
   * Exact twin of `Packing.packingEfficiency` — l116: the next-fit
   * recursion ([[packedCtes]]) next to a first-fit-DECREASING replay
   * (per-chunk recursive fold over (n DESC, doc_id) order carrying the
   * bin-fill LIST; "first bin that fits" = the first index whose fill
   * admits n) and the ⌈tokens/capacity⌉ lower bound, aggregated to the
   * same one-row report with integer micro-unit utilizations.
   */
  def packingEfficiencySql(merges: Seq[(String, String)], binCapacity: Long,
                           chunkSize: Long): String =
    s"""WITH RECURSIVE
       |${packedCtes(merges, binCapacity, chunkSize)},
       |fseq AS (SELECT doc_id, chunk, n,
       |    row_number() OVER (PARTITION BY chunk ORDER BY n DESC, doc_id) AS rn
       |  FROM seq),
       |ffd(chunk, rn, fills) AS (
       |  SELECT chunk, rn, [n] AS fills FROM fseq WHERE rn = 1
       |  UNION ALL
       |  SELECT s.chunk, s.rn,
       |    CASE WHEN len(list_filter(range(1, len(r.fills) + 1),
       |             i -> r.fills[i] + s.n <= $binCapacity)) = 0
       |      THEN list_append(r.fills, s.n)
       |      ELSE list_transform(range(1, len(r.fills) + 1),
       |        i -> CASE WHEN i = list_filter(range(1, len(r.fills) + 1),
       |                j -> r.fills[j] + s.n <= $binCapacity)[1]
       |             THEN r.fills[i] + s.n ELSE r.fills[i] END)
       |    END
       |  FROM ffd r JOIN fseq s ON s.chunk = r.chunk AND s.rn = r.rn + 1),
       |fmax AS (SELECT chunk, max(rn) AS mr FROM fseq GROUP BY 1),
       |ffdb AS (SELECT f.chunk, CAST(len(f.fills) AS BIGINT) AS b
       |  FROM ffd f JOIN fmax m ON m.chunk = f.chunk AND f.rn = m.mr),
       |nfb AS (SELECT chunk, CAST(max(bin) + 1 AS BIGINT) AS b FROM rec GROUP BY 1),
       |cst AS (SELECT chunk, CAST(count(*) AS BIGINT) AS docs,
       |    CAST(sum(n) AS BIGINT) AS total FROM seq GROUP BY 1),
       |per AS (SELECT c.chunk, c.docs, c.total, nf.b AS nf, fd.b AS fd,
       |    (c.total + $binCapacity - 1) // $binCapacity AS lb
       |  FROM cst c JOIN nfb nf USING (chunk) JOIN ffdb fd USING (chunk))
       |SELECT CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(docs) AS BIGINT) AS n_docs,
       |  CAST(sum(total) AS BIGINT) AS total_tokens,
       |  CAST(sum(nf) AS BIGINT) AS bins_next_fit,
       |  CAST(sum(fd) AS BIGINT) AS bins_ffd,
       |  CAST(sum(lb) AS BIGINT) AS bins_lower_bound,
       |  CAST(sum(total) * 1000000 // (sum(nf) * $binCapacity) AS BIGINT)
       |    AS util_next_fit_micro,
       |  CAST(sum(total) * 1000000 // (sum(fd) * $binCapacity) AS BIGINT)
       |    AS util_ffd_micro
       |FROM per""".stripMargin

  /** Exact twin of `Packing.materializeBins` (sequence md5'd on both
    * sides to keep compared rows small): the packing recursion joined
    * back to text, aggregated per (chunk, bin) with the identical
    * id-ordered doc-separator join. */
  def packMaterializeSql(merges: Seq[(String, String)], binCapacity: Long,
                         chunkSize: Long, docSep: String): String =
    s"""WITH RECURSIVE
       |${packedCtes(merges, binCapacity, chunkSize)}
       |SELECT CAST(r.chunk AS BIGINT) AS chunk, CAST(r.bin AS BIGINT) AS bin,
       |  md5(string_agg(d.text, '${OracleSqlUtil.esc(docSep)}' ORDER BY r.doc_id)) AS seq_md5,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(r.n) AS BIGINT) AS total_tokens
       |FROM rec r JOIN documents d USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
}
