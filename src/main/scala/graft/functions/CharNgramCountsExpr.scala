package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character n-gram COUNTS in one compiled pass — gram →
  * occurrence count as a map column.
  *
  * Why it exists (round-11 audit of the two per-token giants,
  * q_langid_nb / q_lm_quality): both queries exploded every trigram
  * INSTANCE (~99M rows at the 100× corpus) and then shuffled that
  * stream on near-unique (doc, gram) keys just to rebuild per-document
  * counts — a full-corpus-width shuffle where map-side combine reduces
  * almost nothing (the §10.15 negative result about persisting those
  * counts was this same shape from the cache side). The counts are a
  * ROW-LOCAL property: this expression walks the codepoints once
  * (reusing [[CharNgramsExpr.compute]]'s offset scan) and emits the
  * finished counts, so the per-doc count "shuffle" disappears from the
  * plan entirely; the training-count aggregation explodes the map
  * (gram, cnt) pairs instead of instances — same totals, ~25% fewer
  * rows, fully map-side-combinable.
  *
  * Short-string semantics follow [[CharNgramsExpr]] (the oracle's
  * `generate_series`): length < n ⇒ empty map. CharNgramCountsSpec pins
  * the map equal to the exploded-gram groupBy counts on real corpus
  * text and on multibyte/boundary shapes.
  */
case class CharNgramCountsExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    CharNgramCountsExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.CharNgramCountsExpr.compute($s, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgramCountsExpr {

  /** Column form: map of n-gram → count (codepoint-based, like SQL
    * `substring`), empty when the string is shorter than n.
    */
  def charNgramCounts(s: Column, n: Int = 3): Column =
    Shims.column(CharNgramCountsExpr(Shims.expression(s), n))

  def compute(s: UTF8String, n: Int): MapData = {
    val grams = CharNgramsExpr.compute(s, n).array
    // insertion-ordered so output is deterministic row-to-row (not that
    // consumers depend on entry order — everything downstream aggregates)
    val hm = new java.util.LinkedHashMap[UTF8String, Long]()
    var i = 0
    while (i < grams.length) {
      val g = grams(i).asInstanceOf[UTF8String]
      // absent key unboxes to 0L (BoxesRunTime.unboxToLong(null))
      val cur: Long = hm.get(g)
      hm.put(g, cur + 1L)
      i += 1
    }
    val keys = new Array[Any](hm.size)
    val vals = new Array[Any](hm.size)
    val it = hm.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}
