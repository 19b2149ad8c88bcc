package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003) over a
  * token array — the per-row core of `q_minimizers` and
  * `CorpusPipeline.minimizerPairs`: hash every 3-token shingle with the
  * portable md5→int64 (value of the first 15 md5 hex digits — identical
  * to `cast(conv(substring(md5(s),1,15),16,10) as bigint)`, which DuckDB
  * replays bit-for-bit), then keep the distinct minimum of every window
  * of 4 consecutive shingle hashes. The declarative form is two chained
  * HOFs (an interpreted md5+conv lambda per shingle, then an
  * `array_min(slice(...))` lambda per window that re-slices the hash
  * array each time); this expression does the whole derivation in one
  * compiled pass — each shingle's md5 is fed token-by-token (no shingle
  * string materializes) and the window min is a 4-element scan.
  *
  * Tokens shorter than w+k-1 = 6 yield an empty array (callers
  * pre-filter `size(tk) >= 6`, mirroring the SQL form). WinnowExprSpec
  * pins expression == HOF chain on real corpus text; the q_minimizers
  * oracle gate re-pins it against DuckDB end to end.
  */
case class WinnowFingerprintsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprintsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.WinnowFingerprintsExpr.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprintsExpr {

  private val K = 3 // shingle width (tokens)
  private val W = 4 // winnowing window (shingles)
  private val SpaceByte = ' '.toByte
  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Column form: distinct winnowing fingerprints (first-occurrence
    * order) of an `array<string>` token column.
    */
  def fingerprints(tk: Column): Column =
    Shims.column(WinnowFingerprintsExpr(Shims.expression(tk)))

  def compute(tk: ArrayData): GenericArrayData = {
    val n = tk.numElements()
    if (n < W + K - 1) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tk.getUTF8String(i); i += 1 }

    // shingle hash: top 60 bits of md5("t_i t_i+1 t_i+2") — fed to the
    // digest token-by-token so the joined string never allocates
    val md = Md5.get()
    val m = n - K + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      md.update(toks(i).getBytes)
      md.update(SpaceByte)
      md.update(toks(i + 1).getBytes)
      md.update(SpaceByte)
      md.update(toks(i + 2).getBytes)
      val d = md.digest()
      val top =
        (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
        (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
        (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
      hs(i) = top >>> 4
      i += 1
    }

    val seen = new java.util.LinkedHashSet[java.lang.Long](2 * (m - W + 1))
    var j = 0
    while (j <= m - W) {
      var mn = hs(j)
      if (hs(j + 1) < mn) mn = hs(j + 1)
      if (hs(j + 2) < mn) mn = hs(j + 2)
      if (hs(j + 3) < mn) mn = hs(j + 3)
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
