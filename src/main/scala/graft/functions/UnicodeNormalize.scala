package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus curation.
  *
  * Web corpora mix precomposed ("é" U+00E9) and decomposed
  * ("e" + U+0301) encodings of the same visible text, which breaks
  * exact dedup, shingling, and tokenization (two byte-distinct docs,
  * one document). `graft_nfc` canonicalizes to NFC;
  * `graft_strip_accents` additionally removes diacritic marks (NFD →
  * drop combining marks → NFC), the standard fold before language-ID
  * and fuzzy matching. Canonical-only transforms: compatibility
  * characters (ligatures, circled digits) and ß are left alone,
  * matching utf8proc/DuckDB `nfc_normalize`/`strip_accents` semantics
  * so results replay in external engines.
  *
  * Both are native Catalyst expressions whose generated code is one
  * static call — they stay inside whole-stage codegen, and the helper
  * short-circuits on pure-ASCII strings (byte length == char length)
  * without copying, which is the overwhelmingly common row at corpus
  * scale.
  */
object UnicodeNorm {

  private def isAscii(s: UTF8String): Boolean =
    s.numBytes() == s.numChars()

  /** NFC canonical composition; pure-ASCII input returned as-is. */
  def nfc(s: UTF8String): UTF8String = {
    if (s == null || isAscii(s)) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD → remove combining marks (Unicode categories Mn/Mc/Me) →
    * NFC. Pure-ASCII input returned as-is.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s == null || isAscii(s)) return s
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

private[functions] trait UnicodeNormExpr extends UnaryExpression {
  def fnName: String
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fnName expects a STRING input, got ${child.dataType.simpleString}")
}

/** `graft_nfc(str)`: NFC Unicode normalization. */
case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def fnName: String = "graft_nfc"
  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_strip_accents(str)`: remove diacritics (NFD → drop marks →
  * NFC).
  */
case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def fnName: String = "graft_strip_accents"
  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNorm.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
