package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization step text dedup and
  * fingerprinting silently depend on: `é` spelled as one composed
  * codepoint (U+00E9) and as `e` + combining acute (U+0065 U+0301) are
  * byte-different, so every hash-keyed operator in the engine (exact
  * dedup, shingles, fingerprints, vocabulary) treats equal-looking text
  * as distinct until someone normalizes. Web corpora mix both spellings
  * freely (different editors, OCR, copy-paste chains).
  *
  * Kernel shape, sized for the 100 TB scan: a byte-scan ASCII fast path
  * returns the INPUT UTF8String untouched (no decode, no allocation —
  * the overwhelmingly common case in English-dominant corpora), then
  * `Normalizer.isNormalized` (cheap quick-check tables) skips the
  * already-NFC remainder, and only strings that actually need composing
  * pay the normalize + re-encode. Whole-stage codegen via the static
  * helper, same pattern as [[CharEntropy]].
  *
  * Judged `q_text_nfc` against DuckDB's `nfc_normalize` (utf8proc) —
  * both implement Unicode canonical composition, so lengths and UTF-8
  * md5s must agree exactly.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeKernel.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeKernel {
  /** NFC-normalize; ASCII and already-normalized inputs are returned
    * as the same UTF8String (zero-copy). */
  def nfc(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

object UnicodeExprs {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (ch: Seq[Expression]) => NfcNormalize(ch.head))
  )
}
