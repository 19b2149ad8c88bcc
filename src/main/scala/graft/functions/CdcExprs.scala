package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking over a token array (the hot loop of
  * `q_cdc_chunks` — ref: the LBFS/FastCDC boundary rule at token
  * granularity).
  *
  * The declarative form is five chained higher-order functions
  * (per-token md5 transform → window-sum transform → boundary filter →
  * slice → array_join); HOF lambdas are interpreted per element, and the
  * chain re-walks the arrays five times. This expression runs the whole
  * doc→chunks derivation as ONE compiled pass: hash each token once,
  * roll the 4-token Karp-Rabin window, emit chunk strings directly.
  * Arithmetic is bit-identical to the SQL form (and therefore to the
  * DuckDB oracle): token hash = first 15 md5 hex digits as a 60-bit
  * integer mod P, window hash = Σ h_i·31^(3-i) mod P, boundary after
  * token j iff the window ending at j ≡ 0 (mod 8), final token always a
  * boundary. CdcExprSpec pins expression == HOF form on real corpus
  * text; the q_cdc_chunks oracle gate pins it against DuckDB.
  *
  * doGenCode emits a single static call, so the expression stays inside
  * whole-stage codegen spans (same pattern as [[DotProduct]]).
  */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.CdcChunksExpr.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunksExpr {

  private val P = 1000000007L
  private val Space = UTF8String.fromString(" ")
  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Column form over an `array<string>` token column. Callers filter
    * `size(tk) >= 4` first (mirroring the SQL form, whose
    * `sequence(4, n)` is only meaningful there); shorter arrays
    * degenerate to one whole-doc chunk.
    */
  def chunks(tk: Column): Column =
    Shims.column(CdcChunksExpr(Shims.expression(tk)))

  /** tokens -> chunk strings under the rolling-hash boundary rule. */
  def compute(tk: ArrayData): GenericArrayData = {
    val n = tk.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tk.getUTF8String(i); i += 1 }

    // token hash: value of the first 15 md5 hex digits (= top 60 bits of
    // the digest), mod P — identical to
    // cast(conv(substring(md5(t),1,15),16,10) as bigint) % P
    val md = Md5.get()
    val th = new Array[Long](n)
    i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks(i).getBytes)
      val top =
        (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
        (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
        (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
      th(i) = (top >>> 4) % P
      i += 1
    }

    // boundary positions (1-based inclusive token index), last token
    // always closing the final chunk
    val ends = new java.util.ArrayList[Integer]
    var j = 3
    while (j < n) {
      val h = (th(j - 3) * 29791L + th(j - 2) * 961L +
        th(j - 1) * 31L + th(j)) % P
      if (h % 8 == 0) ends.add(j + 1)
      j += 1
    }
    if (ends.isEmpty || ends.get(ends.size - 1) != n) ends.add(n)

    val out = new Array[AnyRef](ends.size)
    var prev = 0
    var k = 0
    while (k < ends.size) {
      val e = ends.get(k).intValue
      out(k) = UTF8String.concatWs(Space,
        java.util.Arrays.copyOfRange(toks, prev, e): _*)
      prev = e
      k += 1
    }
    new GenericArrayData(out)
  }
}
