package graft.queries

import graft.llm.NgramLangId

/**
 * DuckDB oracle SQL for the text-analysis family beyond the l3 stopword
 * heuristic: the char-trigram language ID replayed with the SAME profile
 * weights the Spark expression carries (interpolated from
 * [[NgramLangId.Profiles]]), multiplicity-weighted sums, and the identical
 * smallest-code argmax tie-break.
 */
object TextOracles {

  private def esc(s: String): String = OracleSqlUtil.esc(s)

  /** `CASE t WHEN 'tg' THEN w ... ELSE 0 END` scorer for one language. */
  private def weightCase(lang: String): String = {
    val whens = NgramLangId.Profiles(lang)
      .map { case (t, w) => s"WHEN '${esc(t)}' THEN $w" }.mkString(" ")
    s"CASE t $whens ELSE 0 END"
  }

  /** Exact twin of `NgramLangId.langIdNgram(col("text"))` over
    * `documents`: (doc_id, pred_lang). Langs are scored in sorted order
    * and ties resolve to the first (smallest) code via `>=` chaining. */
  def langIdNgramSql: String = {
    val langs = NgramLangId.Langs // sorted
    val scores = langs.map { l =>
      s"""coalesce(list_sum(list_transform(tgs, t -> ${weightCase(l)})), 0) AS ${l}_s"""
    }.mkString(",\n  ")
    // argmax with smallest-code-wins ties: lang i wins when >= all later
    val all = langs.map(l => s"${l}_s")
    val arms = langs.init.zipWithIndex.map { case (l, i) =>
      val later = all.drop(i + 1).map(o => s"${l}_s >= $o").mkString(" AND ")
      s"WHEN $later THEN '$l'"
    }.mkString("\n    ")
    s"""WITH t0 AS (
       |  SELECT doc_id, lower(trim(text)) AS s FROM documents),
       |tg AS (
       |  SELECT doc_id, CASE WHEN length(s) < 3 THEN []::VARCHAR[]
       |    ELSE list_transform(range(1, length(s)-1), i -> s[i:i+2]) END AS tgs
       |  FROM t0),
       |sc AS (
       |  SELECT doc_id,
       |  $scores
       |  FROM tg)
       |SELECT doc_id, CASE
       |    WHEN greatest(${all.mkString(", ")}) <= 0 THEN 'und'
       |    $arms
       |    ELSE '${langs.last}' END AS pred_lang
       |FROM sc""".stripMargin
  }
}
