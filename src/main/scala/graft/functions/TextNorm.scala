package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonical-composition pass every
  * hash-keyed text operator silently depends on: "Café" spelled with
  * a precomposed é (U+00E9) and with e + combining acute (U+0301) are
  * DIFFERENT byte strings (so different md5 fingerprints, different
  * MinHash shingles, different exact-dup groups) but the SAME text.
  * Real corpora mix both forms — crawls re-encode, OCR and keyboards
  * emit decomposed sequences — so fingerprint-level dedup without a
  * normalization pass under-merges. NFC is the W3C/WHATWG-recommended
  * storage form; `java.text.Normalizer` implements the standard
  * Unicode algorithm, as does DuckDB's `nfc_normalize` (utf8proc) —
  * the two agree on every valid input, which is what lets the t21
  * gate hash-compare normalized fingerprints across engines.
  *
  * Kernel shape: the already-normalized fast path (the overwhelming
  * majority of real text — ASCII short-circuits inside
  * `Normalizer.isNormalized`) returns the input UTF8String untouched,
  * no allocation. Codegen'd scalar call, stays inside whole-stage
  * codegen like the other kernels.
  */
object TextNorm {
  def nfc(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc(string) -> string` — see [[TextNorm.nfc]]. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(s: Any): Any =
    TextNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
