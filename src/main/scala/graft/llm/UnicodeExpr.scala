package graft.llm

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen'd expression. Spark has no
 * built-in normalizer; a Scala UDF would pay serde per row. The JDK's
 * `java.text.Normalizer` implements the same UAX #15 canonical composition
 * DuckDB's `nfc_normalize` does, which is what makes the cross-engine
 * oracle exact.
 *
 * Already-NFC input (the overwhelming majority of real text) short-circuits
 * through `Normalizer.isNormalized` — a scan, no allocation.
 */
object UnicodeNormalize {
  /** Static helper shared by interpreted eval and generated code. PUBLIC
    * because generated Java calls it (a `private[llm]` method gets no
    * static forwarder and Janino fails back to interpreted eval). */
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  /** Accent folding: NFD-decompose then drop ALL mark categories (Mn,
    * Mc, Me — utf8proc's STRIP_MARK), recompose — "café" → "cafe",
    * "Ångström" → "Angstrom". The same transform as DuckDB's
    * `strip_accents` (which strips Mc/Me too, not just Mn). ASCII (the
    * common case) short-circuits with a scan, no allocation. */
  def stripAccents(s: UTF8String): UTF8String = {
    val j = s.toString
    var ascii = true
    var i = 0
    while (ascii && i < j.length) { if (j.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val d = java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    // iterate CODE POINTS, not chars: supplementary-plane marks are
    // surrogate pairs whose halves classify as SURROGATE — a char loop
    // would never strip them. Drop ALL mark categories (Mn, Mc, Me) —
    // utf8proc's STRIP_MARK, which is what DuckDB strip_accents applies
    // (verified: it strips Mc U+1D165 too, not just Mn)
    var k = 0
    while (k < d.length) {
      val cp = d.codePointAt(k)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      k += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}

/**
 * Mojibake repair (the ftfy core heuristic, Speer 2019): text that was
 * UTF-8 encoded but decoded as Latin-1 renders each multi-byte sequence as
 * a run of Latin-1 chars ("é" → "Ã©", "—" → "â€”"-style). The repair is the
 * inverse transcode — reinterpret the chars as Latin-1 bytes and decode
 * them as UTF-8 — applied ONLY when it parses cleanly:
 *
 *  - any char > U+00FF → not a Latin-1 rendering at all → unchanged;
 *  - pure ASCII → transcode is the identity → unchanged (fast path, no
 *    allocation);
 *  - strict UTF-8 decode (malformed/unmappable → REPORT, never replace)
 *    fails → legitimate Latin-1 text like "café" (E9 is no UTF-8 lead) →
 *    unchanged. Only a clean parse — which for non-ASCII bytes is vastly
 *    more likely for genuine double-encoding than for real prose — yields
 *    the repaired string.
 *
 * One pass, no regexp gates; the residual ambiguity (Latin-1 prose that
 * happens to be valid UTF-8, e.g. a literal "Ã©") is inherent to the
 * problem and resolved the same way ftfy resolves it (fix_encoding).
 */
object MojibakeRepair {
  /** Static helper shared by interpreted eval and generated code (public
    * for the same Janino static-forwarder reason as [[UnicodeNormalize]]). */
  def fix(s: UTF8String): UTF8String = {
    val j = s.toString
    var hasHigh = false
    var i = 0
    while (i < j.length) {
      val c = j.charAt(i)
      if (c > 0xFF) return s
      if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val bytes = new Array[Byte](j.length)
    i = 0
    while (i < j.length) { bytes(i) = j.charAt(i).toByte; i += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try UTF8String.fromString(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => s }
  }
}

/** Native mojibake repair ([[MojibakeRepair.fix]]) — Latin-1-rendered
  * UTF-8 re-decoded, strictly gated on a clean parse. */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_fix_mojibake requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    MojibakeRepair.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.MojibakeRepair.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepairExpr =
    copy(child = newChild)
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.UnicodeNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Native accent folding ([[UnicodeNormalize.stripAccents]]) — the search-
  * key normalization DuckDB exposes as `strip_accents`. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.UnicodeNormalize.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}
