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
