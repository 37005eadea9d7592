package graft.queries

/**
 * DuckDB oracle SQL for the WordPiece tokenizer ([[graft.llm.WordPiece]]):
 * a recursive CTE replays the IDENTICAL greedy longest-match-first scan
 * over every distinct word, with the vocabulary interpolated from the same
 * Scala values the Spark expression carries — the [[BpeOracles]] pattern
 * applied to the position-scan loop instead of the merge loop.
 *
 * Replay state per word is (pos, out): `pos` is the current 1-based code-
 * point position, `out` the pieces emitted so far. Each step computes the
 * longest matching BASE length at `pos` via a vocab-list comprehension —
 * word-initial positions admit only bare pieces, word-internal only
 * `##`-prefixed ones (matched on their stripped base) — then advances.
 * A no-match step sets `pos = -1` and `out = '[UNK]'`: the whole-word-UNK
 * contract, and a terminal state the recursion filter stops on. Success
 * terminates at `pos = length(w) + 1`. Depth is bounded by word length
 * (every step advances ≥ 1 code point).
 */
object WordPieceOracles {

  private def esc(s: String): String = OracleSqlUtil.esc(s)

  private def vocabListSql(vocab: Seq[String]): String =
    vocab.map(p => s"'${esc(p)}'").mkString("[", ", ", "]")

  /** Longest matching base length at (w, pos) against vocab list `v`
    * (NULL when nothing matches). DuckDB slicing is code-point-based and
    * clamps past the end, so an over-long piece compares against a SHORTER
    * slice and can never spuriously equal it. */
  private def pickSql: String =
    """list_max(list_filter(list_transform(v, p ->
      |    CASE WHEN pos = 1 AND p NOT LIKE '##%' AND p = w[1:length(p)] THEN length(p)
      |         WHEN pos > 1 AND p LIKE '##%' AND length(p) > 2
      |              AND p[3:] = w[pos:pos+length(p)-3] THEN length(p) - 2
      |         ELSE NULL END),
      |  x -> x IS NOT NULL))""".stripMargin

  /** Shared CTE block ending in `wc(w, out)` — the final encoding of every
    * distinct word — plus `tok(doc_id, w, pos)` with in-document word
    * positions. Spec step 1's lowercasing happens in `toks`. */
  private def encodeCtes(vocab: Seq[String]): String =
    s"""vl AS (SELECT ${vocabListSql(vocab)} AS v),
       |toks AS (
       |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
       |  FROM documents WHERE text IS NOT NULL),
       |tok AS (SELECT doc_id, unnest(t) AS w, unnest(range(len(t))) AS pos FROM toks),
       |words AS (SELECT DISTINCT w FROM tok WHERE length(w) > 0),
       |enc(w, pos, out, best) AS (
       |  SELECT w, pos, out, $pickSql
       |  FROM (SELECT w, 1 AS pos, '' AS out FROM words), vl
       |  UNION ALL
       |  SELECT w, pos, out, $pickSql
       |  FROM (SELECT w,
       |          CASE WHEN best IS NULL THEN -1 ELSE pos + best END AS pos,
       |          CASE WHEN best IS NULL THEN '[UNK]'
       |               WHEN pos = 1 THEN w[1:best]
       |               ELSE out || ' ##' || w[pos:pos+best-1] END AS out
       |        FROM enc WHERE pos >= 1 AND pos <= length(w)), vl),
       |wc AS (SELECT w, out FROM enc WHERE pos = -1 OR pos > length(w))""".stripMargin

  /** Exact twin of `WordPiece.encodeTokens(col("text"), vocab)` over the
    * `documents` table: (doc_id, wp_text). */
  def encodeSql(vocab: Seq[String]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(vocab)},
       |asm AS (
       |  SELECT t.doc_id, string_agg(wc.out, ' ' ORDER BY t.pos) AS s
       |  FROM tok t JOIN wc USING (w) WHERE length(wc.out) > 0 GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(a.s, '') END AS wp_text
       |FROM documents d LEFT JOIN asm a USING (doc_id)""".stripMargin

  /** Twin of the per-language WordPiece coverage audit: token totals,
    * UNK-word counts and word counts per lang — the out-of-vocabulary
    * rate a tokenizer migration gates on. Both engines re-derive the
    * numbers from their OWN replay of the encoding (not from l118's
    * output), so the aggregate independently cross-checks the scan. */
  def unkAuditSql(vocab: Seq[String]): String =
    s"""WITH RECURSIVE
       |${encodeCtes(vocab)},
       |wpc AS (
       |  SELECT t.doc_id,
       |    SUM(len(string_split(wc.out, ' '))) AS wp,
       |    SUM(CASE WHEN wc.out = '[UNK]' THEN 1 ELSE 0 END) AS unk,
       |    COUNT(*) AS words
       |  FROM tok t JOIN wc USING (w) WHERE length(wc.out) > 0 GROUP BY 1)
       |SELECT d.lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(COALESCE(w.words, 0)) AS BIGINT) AS n_words,
       |  CAST(SUM(COALESCE(w.wp, 0)) AS BIGINT) AS wp_tokens,
       |  CAST(SUM(COALESCE(w.unk, 0)) AS BIGINT) AS wp_unk_words
       |FROM documents d LEFT JOIN wpc w USING (doc_id)
       |WHERE d.text IS NOT NULL GROUP BY 1""".stripMargin
}
