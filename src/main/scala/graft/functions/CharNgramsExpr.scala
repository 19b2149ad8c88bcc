package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character n-gram extraction — the hot loop of the trained
  * language-ID / LM-quality family (`q_langid_nb`, `q_lm_quality`), which
  * explodes every overlapping character trigram of each document's
  * (lowered, truncated) text. The declarative form,
  *
  *   transform(sequence(1, greatest(length(s) - 2, 0)),
  *     i -> substring(s, i, 3))
  *
  * evaluates an interpreted lambda per position and each `substring`
  * re-walks the string's UTF-8 bytes from the start (O(len²) byte scans
  * per row on top of the per-element interpretation). This expression
  * computes the codepoint offsets ONCE and slices each n-gram with a
  * single bounded byte copy.
  *
  * Semantics for `length(s) < n` follow the ORACLE's
  * `generate_series(1, len-2)` (empty list ⇒ no grams): the old Spark HOF's
  * `sequence(1, 0)` is DESCENDING (`[1, 0]`), which would emit two junk
  * sub-n grams DuckDB never produces — the corpus has no such docs (the
  * gate is green both ways), so the native expression adopts the oracle's
  * cleaner semantics and CharNgramsExprSpec pins both facts: equality with
  * the HOF on every real doc, and the empty array on short strings.
  *
  * doGenCode emits a single static call, so the expression stays inside
  * whole-stage codegen spans (same pattern as [[ShinglesExpr]]).
  */
case class CharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CharNgramsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharNgramsExpr.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramsExpr {

  /** Column form: all overlapping n-character substrings of a string
    * column (codepoint-based, like SQL `substring`), empty when the
    * string is shorter than n.
    */
  def charNgrams(s: Column, n: Int = 3): Column =
    Shims.column(CharNgramsExpr(Shims.expression(s), n))

  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val m = bytes.length
    // codepoint start offsets (offs(c) = byte offset of char c)
    var chars = 0
    var i = 0
    while (i < m) { i += UTF8String.numBytesForFirstByte(bytes(i)); chars += 1 }
    if (chars < n) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](chars + 1)
    i = 0; var c = 0
    while (i < m) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(chars) = m
    val out = new Array[AnyRef](chars - n + 1)
    var j = 0
    while (j <= chars - n) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new GenericArrayData(out)
  }
}
