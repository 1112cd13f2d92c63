package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition, then canonical
  * composition) as a native codegen'd expression — the preprocessing
  * step every multilingual corpus needs BEFORE tokenization,
  * fingerprinting or dedup: the same visible text can arrive composed
  * ("é" U+00E9) or decomposed ("e" U+0065 + U+0301), and byte-keyed
  * operators (exact dedup's content hash, shingle MinHash, vocabulary
  * counts) treat the two as different documents unless the corpus is
  * normalized to one canonical form first.
  *
  * NFC (not NFKC) deliberately: canonical equivalence only — ligature/
  * width/compatibility folding changes text content and belongs in a
  * separate, opt-in cleaning pass.
  *
  * Semantics match DuckDB's `nfc_normalize` (utf8proc) — both
  * implement Unicode Standard Annex #15, so the operator is
  * oracle-gated exactly (q_text_nfc). The common case is a no-op:
  * `Normalizer.isNormalized` has a fast quick-check path (ASCII and
  * already-composed text short-circuit), and the input UTF8String is
  * returned UNCHANGED (no copy) when already normalized — at 100 TB
  * the normalizer is a narrow projection that allocates only on the
  * rare denormalized row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc expects string, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = child.dataType

  override protected def nullSafeEval(input: Any): Any =
    NfcRuntime.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcRuntime.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcRuntime {
  /** NFC-normalize one value; returns the INPUT object (no allocation)
    * when it is already in NFC — the overwhelmingly common case. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
