package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}

/** The 60-bit SimHash fingerprint of a token ARRAY in one compiled
  * row-grain pass — the per-document core of the SimHash near-dup
  * family (`SketchDedupQueries.simhashSigOver`). The declarative form
  * exploded every token (one row per token instance), hashed each via
  * [[Md5Hash60Expr]], and shuffled the stream into a
  * [[SignedBitSum]] aggregate before folding the 60 signed sums into
  * bits; since every token of a document lives in its own row, the
  * whole signed-popcount is computable per row — no explode, no
  * per-token shuffle. Arithmetic is unchanged: for each non-empty
  * token, bit j of md5-top-60 contributes +1/−1 to sum_j, and
  * fingerprint bit j is set iff sum_j > 0 — exactly the chain the
  * DuckDB oracle replays column-wise.
  *
  * A document with NO non-empty token returns NULL (the exploded form
  * produced no row for it, so it was absent from the aggregate);
  * consumers filter `isNotNull`, textually mirroring the oracle's
  * `WHERE tok <> ''` stream. SimHashSpec pins the expression to the
  * declarative chain on corpus data plus empty/whitespace/unicode
  * edges; the oracle gate re-pins every consumer.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}_r = graft.functions.SimHashExpr.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {

  private val Bits = 60

  /** Column form: the 60-bit simhash of a token array (null if the
    * array holds no non-empty token).
    */
  def of(tokens: Column): Column =
    Shims.column(SimHashExpr(Shims.expression(tokens)))

  def compute(tokens: ArrayData): java.lang.Long = {
    val sums = new Array[Int](Bits)
    val n = tokens.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        seen = true
        val hx = Md5Hash60Expr.compute(t)
        var j = 0
        while (j < Bits) {
          if (((hx >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
      i += 1
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
