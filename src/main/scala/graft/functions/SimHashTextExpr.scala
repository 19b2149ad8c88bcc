package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit SimHash of a document's TEXT in one fused byte walk —
  * tokenization and per-token hashing in the same pass, no intermediate
  * token array.
  *
  * Provably equal to `SimHashExpr(split(trim(text), "\\s+"))` (the form
  * it replaces in `simhashSigOver`; SimHashTextSpec pins it on corpus
  * text and whitespace/unicode/empty edges): Java's `\s` is exactly the
  * six ASCII bytes {space, \t, \n, \x0B, \f, \r} — none of which can
  * appear inside a UTF-8 multibyte sequence — so the split's non-empty
  * token stream is precisely the maximal runs of non-whitespace bytes,
  * and [[SimHashExpr]] skips the empty tokens trim/split edge cases
  * produce. Each run hashes via [[Md5Hash60Expr.computeRange]] over the
  * document's own buffer: the split form allocated a fresh UTF8String
  * per token (27M tokens at the 100× corpus) only for the hash to
  * consume it once — per-row CPU that a 100 TB signature pass pays in
  * core-hours even when the wall clock is scan-parallel.
  *
  * NULL when the text holds no non-whitespace byte (mirrors
  * SimHashExpr's no-non-empty-token NULL, which mirrors the oracle's
  * `WHERE tok <> ''` stream).
  */
case class SimHashTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}_r = graft.functions.SimHashTextExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashTextExpr {

  private val Bits = 60

  /** Column form: the 60-bit simhash of whitespace-tokenized text (null
    * if the text holds no non-whitespace byte).
    */
  def of(text: Column): Column =
    Shims.column(SimHashTextExpr(Shims.expression(text)))

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  def compute(s: UTF8String): java.lang.Long = {
    // resolve to an on-heap byte range; one copy per DOCUMENT at worst
    // (off-heap base), never per token
    val n = s.numBytes()
    var arr: Array[Byte] = null
    var start = 0
    s.getBaseObject match {
      case a: Array[Byte] =>
        val off = s.getBaseOffset - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        if (off >= 0 && off + n <= a.length) { arr = a; start = off.toInt }
      case _ =>
    }
    if (arr == null) { arr = s.getBytes; start = 0 }

    val sums = new Array[Int](Bits)
    var seen = false
    var i = 0
    while (i < n) {
      // skip the whitespace run
      while (i < n && isWs(arr(start + i))) i += 1
      val t0 = i
      while (i < n && !isWs(arr(start + i))) i += 1
      if (i > t0) {
        seen = true
        val hx = Md5Hash60Expr.computeRange(arr, start + t0, i - t0)
        var j = 0
        while (j < Bits) {
          if (((hx >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
    }
    if (!seen) return null
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (sums(j) > 0) fp |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
