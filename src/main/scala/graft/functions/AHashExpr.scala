package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The 64-bit average-hash signature of `q_phash_neardup`, as ONE pass
  * per document: the declarative form exploded every character position
  * (`substring(text, pos, 1)` re-walks the string per position —
  * O(len²) byte scans) into a ~50M-row frame at sf0.1 and ran TWO
  * shuffled aggregations (per-segment means, per-doc mean) before the
  * bit decisions. This expression walks the codepoints once,
  * accumulates the 64 segment sums/counts and the global sum locally,
  * and emits the four 16-bit band words directly.
  *
  * Bit-exact to the declarative chain (AHashExprSpec pins it, the
  * oracle re-pins end-to-end): segment of position pos (1-based) is
  * `(pos-1)·64 div n`, sample is the codepoint (Spark/DuckDB `ascii`
  * of the single-char substring), means compare as half-up integer
  * micro-units `(2·10⁶·s + c) div (2·c)`, and band w's word is
  * Σ 2^(seg mod 16) over set bits with seg div 16 = w. Callers filter
  * `length(text) >= 64` (mirroring the SQL form — every segment then
  * holds ≥ 1 sample); shorter inputs return the four words of the
  * degenerate grid with empty segments skipped.
  */
case class AHashBandsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    AHashBandsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.AHashBandsExpr.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHashBandsExpr {

  /** Column form: the four 16-bit aHash band words of a string column. */
  def bands(text: Column): Column =
    Shims.column(AHashBandsExpr(Shims.expression(text)))

  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val m = bytes.length
    // one codepoint walk: segment sums/counts + global sum
    val n = text.numChars().toLong
    // empty input: every segment is empty, so every bit-decision is
    // skipped — the degenerate grid is all-zero words (no division by the
    // zero codepoint count). Callers filter length >= 64 so this is a
    // contract guard, not a hot path.
    if (n == 0) return new GenericArrayData(Array[Any](0L, 0L, 0L, 0L))
    val segS = new Array[Long](64)
    val segC = new Array[Long](64)
    var tot = 0L
    var i = 0
    var pos = 0L
    while (i < m) {
      val b0 = bytes(i)
      val w = UTF8String.numBytesForFirstByte(b0)
      // codepoint value — same as Spark's ascii(substring(text, pos, 1))
      val cp: Long = w match {
        case 1 => b0 & 0x7fL
        case 2 => ((b0 & 0x1fL) << 6) | (bytes(i + 1) & 0x3fL)
        case 3 => ((b0 & 0x0fL) << 12) | ((bytes(i + 1) & 0x3fL) << 6) |
          (bytes(i + 2) & 0x3fL)
        case _ => ((b0 & 0x07L) << 18) | ((bytes(i + 1) & 0x3fL) << 12) |
          ((bytes(i + 2) & 0x3fL) << 6) | (bytes(i + 3) & 0x3fL)
      }
      val seg = ((pos * 64) / n).toInt // pos is 0-based here = (1-based pos) - 1
      segS(seg) += cp
      segC(seg) += 1
      tot += cp
      pos += 1
      i += w
    }
    val g6 = (2 * 1000000L * tot + n) / (2 * n)
    val out = new Array[Any](4)
    var band = 0
    while (band < 4) {
      var bv = 0L
      var s = 0
      while (s < 16) {
        val seg = band * 16 + s
        if (segC(seg) > 0) {
          val m6 = (2 * 1000000L * segS(seg) + segC(seg)) / (2 * segC(seg))
          if (m6 > g6) bv += (1L << s)
        }
        s += 1
      }
      out(band) = bv
      band += 1
    }
    new GenericArrayData(out)
  }
}
