package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the single most frequent element of an `array<string>` in one
  * compiled hash pass.
  *
  * Why it exists (round-12 audit of interpreted higher-order functions in
  * hot paths): the repetition filter's top-token signal was
  *
  *   array_max(transform(array_distinct(tk), w -> size(filter(tk, x -> x = w))))
  *
  * — O(distinct × length) per document, with BOTH lambdas evaluated
  * interpreted (lambda functions never enter whole-stage codegen). On the
  * 100× probe corpus the standalone q_repetition_filter spent 62 s almost
  * entirely in that expression, and the cost grows quadratically with
  * document length — a scale-killer on a long-document corpus even though
  * the sf0.1 bench barely sees it. This expression is one linear
  * hash-count walk over the array buffer, codegen-composable, and
  * length-linear at any document size.
  *
  * Exact lambda-chain semantics (TopTokenCountSpec pins all of them):
  * empty array → NULL (array_max of an empty array is NULL); NULL
  * elements count 0 (x = w with a NULL side is NULL, so filter drops
  * every row: an all-NULL array yields 0, not NULL); ties take the max
  * count regardless of token.
  */
case class TopTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    TopTokenCountExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // fresh per-instance name: nullSafeCodeGen emits this snippet without an
      // enclosing block when the child is non-nullable, so a fixed local name
      // would collide (janino duplicate-variable) if two instances share one
      // codegen scope and silently drop the plan out of whole-stage codegen.
      val r = ctx.freshName("topTokenCount")
      s"""
         |Object $r = graft.functions.TopTokenCountExpr.compute($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((Long) $r).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopTokenCountExpr {

  /** Column form: max occurrence count of any element, NULL for an empty
    * array (mirrors `array_max(transform(array_distinct(a), w ->
    * size(filter(a, x -> x = w))))`).
    */
  def topTokenCount(a: Column): Column =
    Shims.column(TopTokenCountExpr(Shims.expression(a)))

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    if (n == 0) return null
    val hm = new java.util.HashMap[UTF8String, Long](Math.min(n * 2, 1 << 16))
    var best = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        // absent key unboxes to 0L (BoxesRunTime.unboxToLong(null))
        val cur: Long = hm.get(t)
        val c = cur + 1L
        hm.put(t, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
