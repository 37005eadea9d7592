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

  /** Locale-independent SIMPLE-mapping lowercase (per code point, like
    * DuckDB's `lower()`): `String.toLowerCase()` applies locale-dependent
    * FULL mappings — 'İ' → "i"+U+0307 (an extra code point that shifts
    * every later trigram frame vs the oracle) and, under a Turkish-locale
    * JVM, 'I' → 'ı' (profiles stop matching entirely). */
  private[llm] def simpleLower(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      sb.appendCodePoint(Character.toLowerCase(cp))
      ci += Character.charCount(cp)
    }
    sb.toString
  }

  /** All char trigrams of `s` (with multiplicity), in order. */
  private[llm] def trigrams(s: String): Seq[String] =
    if (s.length < 3) Seq.empty
    else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** trigram → weight (K − rank) for one language's top-K profile;
    * deterministic (freq desc, trigram asc) ranking. */
  private[llm] def profileOf(text: String, k: Int = ProfileSize): Seq[(String, Int)] = {
    val counts = trigrams(simpleLower(text)).groupBy(identity)
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
    // space-only trim to match Spark's trim() exactly, then simple lower
    val tgs = trigrams(simpleLower(BpeTable.trimSpaces(text)))
    var bs = -1L
    var bl = "und"
    Langs.foreach { l =>
      val w = Profiles(l).toMap
      val s = tgs.iterator.map(t => w.getOrElse(t, 0).toLong).sum
      if (s > bs) { bs = s; bl = l }
    }
    if (bs <= 0L) "und" else bl
  }

  /** The default scorer over [[Profiles]] in sorted-language order. */
  lazy val defaultScorer: LangIdScorer = new LangIdScorer(Langs.map(l => l -> Profiles(l)))

  /** Column form: native one-pass expression (the HOF formulation below
    * re-evaluates `lower(trim(text))` per trigram inside the lambda — no
    * CSE in lambda bodies — which measured 30 s for the sf0.1 registry
    * row vs 0.2 s for this). */
  def langIdNgram(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(LangIdNgramExpr(expression(text)))
  }

  /** Expression-composed twin kept as the independent definition the
    * native expression is parity-tested against (NOT the hot path).
    * Lowercasing is the ONE primitive shared with the native expression
    * (a UDF over [[simpleLower]]): Spark's `lower()` applies FULL/locale
    * mappings ('İ' → 'i' + U+0307), which would make the parity test flake
    * on such inputs even though the hot path and the oracle — both
    * simple-lowering — agree. The trigram framing and scoring below stay
    * independently expressed, which is what the parity test exercises. */
  private[llm] def langIdNgramHof(text: Column): Column = {
    val simpleLowerUdf = udf((raw: String) => Option(raw).map(simpleLower))
    val s = simpleLowerUdf(trim(text))
    val tgs = when(length(s) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(s) - 2), i => substring(s, i, lit(3))))
    // array_max compares structs field-by-field: (score, pri, lang) with
    // pri = reverse language position makes equal-score ties resolve to
    // the lexicographically SMALLEST code, matching [[predict]]
    val ranked = Langs.zipWithIndex.map { case (l, i) => (l, Langs.length - i) }.toMap
    val scored = Langs.map { l =>
      // typedlit, NOT map(lit...): CreateMap inside the lambda body is
      // re-evaluated PER ARRAY ELEMENT (one fresh 2K-slot map per trigram
      // per language — measured 30 s for the registry row at sf0.1);
      // typedlit bakes the profile into a single MapType Literal (0.3 s)
      val m = typedlit(Profiles(l).toMap)
      val score = aggregate(tgs, lit(0L),
        (acc, t) => acc + coalesce(element_at(m, t).cast("long"), lit(0L)))
      struct(score.as("score"), lit(ranked(l)).as("pri"), lit(l).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}

/**
 * One-pass scorer shared by interpreted eval and generated code: a single
 * trigram→weights[nLangs] hash map, one slide over the string. Top-level
 * public class — generated Java references it by source name (a nested
 * object class's `Outer$Inner` binary name is not valid Java source).
 */
final class LangIdScorer(profiles: Seq[(String, Seq[(String, Int)])])
    extends Serializable {
  private val nLangs = profiles.size
  @transient private lazy val weights: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, prof), li) =>
      prof.foreach { case (t, w) =>
        val arr = m.computeIfAbsent(t, _ => new Array[Int](nLangs))
        arr(li) = w
      }
    }
    m
  }
  private val langCodes: Array[String] = profiles.map(_._1).toArray

  /** Argmax language over one pass of code-point trigrams; ties and
    * all-zero scores resolve exactly like the HOF/oracle twins. */
  def predict(raw: String): String = {
    val s = NgramLangId.simpleLower(BpeTable.trimSpaces(raw))
    val scores = new Array[Long](nLangs)
    if (s.length >= 3) {
      // code-point boundaries (trigram = 3 code points, matching DuckDB
      // slicing and profileOf)
      val bounds = new Array[Int](s.codePointCount(0, s.length) + 1)
      var ci = 0; var n = 0
      while (ci < s.length) { bounds(n) = ci; n += 1; ci += Character.charCount(s.codePointAt(ci)) }
      bounds(n) = s.length
      var i = 0
      while (i + 3 <= n) {
        val w = weights.get(s.substring(bounds(i), bounds(i + 3)))
        if (w != null) { var li = 0; while (li < nLangs) { scores(li) += w(li); li += 1 } }
        i += 1
      }
    }
    var bs = 0L; var bl = "und"; var li = 0
    while (li < nLangs) {
      if (scores(li) > bs) { bs = scores(li); bl = langCodes(li) }
      li += 1
    }
    bl
  }
}

/** Native one-pass trigram-profile language ID (see [[NgramLangId]]): the
  * scorer rides the plan as a reference object; NULL text classifies as
  * "und" (unknown ≡ undetermined), matching the SQL twin's semantics. */
case class LangIdNgramExpr(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lang_id_ngram requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id_ngram"
  // null in → "und" out, not NULL (the operator classifies unknown input)
  override def nullable: Boolean = false

  @transient private lazy val scorer = NgramLangId.defaultScorer

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) "" else v.asInstanceOf[UTF8String].toString
    UTF8String.fromString(scorer.predict(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("langScorer", scorer,
      classOf[LangIdScorer].getName)
    val c = child.genCode(ctx)
    val u = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(
      code = code"""
        ${c.code}
        $u ${ev.value} = $u.fromString(
          $ref.predict(${c.isNull} ? "" : ${c.value}.toString()));
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): LangIdNgramExpr =
    copy(child = newChild)
}
