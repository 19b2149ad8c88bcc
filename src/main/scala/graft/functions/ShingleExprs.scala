package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-token shingling over a token array — the single hottest
  * idiom in the corpus-op family (n-gram Jaccard, MinHash/LSH banding,
  * decontamination, contamination stats, novelty, threshold sweep,
  * incremental/streaming dedup all start from it). The declarative form,
  *
  *   array_distinct(transform(sequence(0, size(tk)-k),
  *     i -> concat_ws(' ', tk[i], ..., tk[i+k-1])))
  *
  * evaluates an interpreted lambda per window (HOFs never enter
  * whole-stage codegen) and allocates a sequence array per row. This
  * expression emits the distinct shingle array in ONE compiled pass:
  * slide the window, build each shingle with a single byte copy, dedup
  * with a hash set that preserves first-occurrence order (exactly
  * `array_distinct`'s semantics, so results are bit-identical and every
  * DuckDB oracle is unchanged). ShingleExprSpec pins expression == HOF
  * on real corpus text; the oracle gate re-pins every consumer.
  *
  * doGenCode emits a single static call so the expression stays inside
  * whole-stage codegen spans (same pattern as [[DotProduct]] /
  * [[CdcChunksExpr]]).
  */
case class ShinglesExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.ShinglesExpr.compute($a, $k, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesExpr {

  private val Space = UTF8String.fromString(" ")

  /** Column form: distinct k-token shingles of an `array<string>` token
    * column, space-joined, first-occurrence order. Callers filter
    * `size(tk) >= k` first (mirroring the HOF form, whose
    * `sequence(0, n-k)` is only meaningful there); shorter arrays yield
    * an empty result.
    */
  def shingles(tk: Column, k: Int = 3, distinct: Boolean = true): Column =
    Shims.column(ShinglesExpr(Shims.expression(tk), k, distinct))

  def compute(tk: ArrayData, k: Int, distinct: Boolean): GenericArrayData = {
    val n = tk.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tk.getUTF8String(i); i += 1 }
    val win = new Array[UTF8String](k)
    if (!distinct) {
      val out = new Array[AnyRef](n - k + 1)
      i = 0
      while (i <= n - k) {
        System.arraycopy(toks, i, win, 0, k)
        out(i) = UTF8String.concatWs(Space, win: _*)
        i += 1
      }
      return new GenericArrayData(out)
    }
    // LinkedHashSet == array_distinct semantics: binary equality, keep
    // the first occurrence, preserve encounter order
    val seen = new java.util.LinkedHashSet[UTF8String](2 * (n - k + 1))
    i = 0
    while (i <= n - k) {
      System.arraycopy(toks, i, win, 0, k)
      seen.add(UTF8String.concatWs(Space, win: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }
}
