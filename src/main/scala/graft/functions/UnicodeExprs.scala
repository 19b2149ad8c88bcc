package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd Catalyst expression.
  *
  * Web-scraped corpora mix composed and decomposed forms of the same
  * grapheme ("é" as U+00E9 vs "e"+U+0301); every downstream exact-match
  * operator — dedup hashing, shingling, vocabulary counting, PII
  * regexes — silently treats them as different text unless the corpus
  * is normalized first. NFC is the canonical-composition form the
  * Unicode standard recommends for comparison, and DuckDB ships it as
  * `nfc_normalize`, which is what lets the driver gate this
  * bit-for-bit.
  *
  * The JDK's `java.text.Normalizer` is the implementation in BOTH the
  * interpreted and generated paths (one static call in the generated
  * code, no per-row allocation beyond the unavoidable String bridge),
  * so the expression stays inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeExprs {
  import org.apache.spark.sql.graftshim.Shims
  def nfc(c: Column): Column = Shims.column(NfcNormalize(Shims.expression(c)))
}
