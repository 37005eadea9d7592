package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Char-trigram-profile language ID (Cavnar–Trenkle-style): each language
 * has a fixed profile of its top-K trigrams from embedded training text,
 * weighted `K − rank`; a document scores Σ weight(trigram) over ALL its
 * trigram occurrences (multiplicity included) and takes the argmax
 * language, `"und"` when every score is 0 (or the text has < 3 chars, or
 * is NULL — unknown input classifies as undetermined, never as NULL).
 * Deterministic end to end: profiles are compile-time constants, ties
 * break to the lexicographically smallest language code.
 *
 * Complements the stopword-hit heuristic ([[TextOps.langIdHeuristic]]):
 * trigram profiles detect languages even when function words are absent
 * (short strings, technical prose). Expression-only — trigram extraction
 * and the per-language weighted sums stay in whole-stage codegen; the
 * profile weights are interpolated into the SAME SQL the DuckDB oracle
 * replays ([[graft.queries.BpeOracles]]-style exact twin).
 */
object NgramLangId {

  val ProfileSize = 40

  /** Embedded per-language training text (generic public prose). Fixed
    * forever — the profiles interpolated into committed oracle SQL must
    * never drift. */
  val TrainingText: Map[String, String] = Map(
    "en" -> ("the quick brown fox jumps over the lazy dog while the little " +
      "children watch the evening light and the old houses stand along the " +
      "quiet street where people walk together through the morning air"),
    "de" -> ("der schnelle braune fuchs springt über den faulen hund während " +
      "die kleinen kinder das abendlicht betrachten und die alten häuser an " +
      "der stillen strasse stehen wo die menschen am morgen zusammen gehen"),
    "es" -> ("el rápido zorro marrón salta sobre el perro perezoso mientras " +
      "los niños pequeños miran la luz de la tarde y las casas viejas están " +
      "en la calle tranquila donde la gente camina junta por la mañana"),
    "fr" -> ("le rapide renard brun saute par dessus le chien paresseux " +
      "pendant que les petits enfants regardent la lumière du soir et les " +
      "vieilles maisons se dressent dans la rue calme où les gens marchent " +
      "ensemble dans le matin"))

  /** All char trigrams of `s` (with multiplicity), in order. */
  private[llm] def trigrams(s: String): Seq[String] =
    if (s.length < 3) Seq.empty
    else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** trigram → weight (K − rank) for one language's top-K profile;
    * deterministic (freq desc, trigram asc) ranking. */
  private[llm] def profileOf(text: String, k: Int = ProfileSize): Seq[(String, Int)] = {
    val counts = trigrams(text.toLowerCase).groupBy(identity)
      .map { case (t, occ) => (t, occ.size) }.toSeq
    counts.sortBy { case (t, n) => (-n, t) }.take(k)
      .zipWithIndex.map { case ((t, _), r) => (t, k - r) }
  }

  /** The fixed profiles, language code → (trigram, weight) list. */
  lazy val Profiles: Map[String, Seq[(String, Int)]] =
    TrainingText.map { case (lang, text) => lang -> profileOf(text) }

  lazy val Langs: Seq[String] = Profiles.keys.toSeq.sorted

  /** Pure-Scala reference scorer (spec twin of the Column expression).
    * Argmax with smallest-code tie-break: scan langs in sorted order,
    * keep only strict improvements. */
  private[llm] def predict(text: String): String = {
    // space-only trim to match Spark's trim() exactly, then lower
    val tgs = trigrams(BpeTable.trimSpaces(text).toLowerCase)
    var bs = -1L
    var bl = "und"
    Langs.foreach { l =>
      val w = Profiles(l).toMap
      val s = tgs.iterator.map(t => w.getOrElse(t, 0).toLong).sum
      if (s > bs) { bs = s; bl = l }
    }
    if (bs <= 0L) "und" else bl
  }

  /** Column form: argmax over per-language weighted trigram sums.
    * Trigram array is materialized once; each language folds one
    * `element_at(map, tg)` sum over it — all inside codegen. */
  def langIdNgram(text: Column): Column = {
    val s = lower(trim(text))
    val tgs = when(length(s) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - 2), i => substring(s, i, lit(3))))
    // array_max compares structs field-by-field: (score, pri, lang) with
    // pri = reverse language position makes equal-score ties resolve to
    // the lexicographically SMALLEST code, matching [[predict]]
    val ranked = Langs.zipWithIndex.map { case (l, i) => (l, Langs.length - i) }.toMap
    val scored = Langs.map { l =>
      val m = map(Profiles(l).flatMap { case (t, w) => Seq(lit(t), lit(w)) }: _*)
      val score = aggregate(tgs, lit(0L),
        (acc, t) => acc + coalesce(element_at(m, t).cast("long"), lit(0L)))
      struct(score.as("score"), lit(ranked(l)).as("pri"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
