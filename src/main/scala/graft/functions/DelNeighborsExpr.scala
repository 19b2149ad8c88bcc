package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native FastSS deletion-neighborhood blocking keys — the hot loop of
  * the entity-resolution family (`q_fuzzy_match`, `q_er_clusters`,
  * `q_golden_record`): every string reachable from the input by deleting
  * ≤ 2 characters, emitted as its `xxhash64` (seed 42 — identical to
  * Spark's `xxhash64(variant_string)`, so an index written by the old
  * form joins against one written by this one). The declarative form is a
  * nested `transform(sequence(...))` pyramid building 1 + n + n(n-1)/2
  * variant STRINGS per record through interpreted lambdas and six
  * `substring`/`concat` calls each (~170 allocations for a 17-char name,
  * then a second interpreted pass to hash them). This expression computes
  * codepoint offsets once, assembles each variant into ONE reusable byte
  * buffer with ≤ 3 contiguous copies, and hashes it in place — no variant
  * string ever materializes.
  *
  * Dedup is by hash rather than by variant string (the old form
  * `array_distinct`ed strings first): identical sets barring an xxhash64
  * collision between two distinct variants of the SAME record — and a
  * collision only changes candidate-pair multiplicity, which every
  * consumer collapses with `.distinct()` before the exact levenshtein
  * verify, so results are unchanged even then (same argument the
  * hash-join blocking itself relies on). DelNeighborsExprSpec pins
  * hash-set equality with the HOF form on real customer names, dirty
  * probes, and unicode/short edges.
  *
  * doGenCode emits a single static call, so the expression stays inside
  * whole-stage codegen spans (same pattern as [[ShinglesExpr]]).
  */
case class DelNeighborsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    DelNeighborsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.DelNeighborsExpr.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DelNeighborsExpr {

  private val Seed = 42L // xxhash64's fixed seed in Spark's function registry

  /** Column form: distinct xxhash64 values of the ≤2-deletion
    * neighborhood (the string itself, every 1-deletion, every
    * 2-deletion) of a string column.
    */
  def delNeighborHashes(s: Column): Column =
    Shims.column(DelNeighborsExpr(Shims.expression(s)))

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val m = bytes.length
    var chars = 0
    var i = 0
    while (i < m) { i += UTF8String.numBytesForFirstByte(bytes(i)); chars += 1 }
    val offs = new Array[Int](chars + 1)
    i = 0; var c = 0
    while (i < m) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(chars) = m

    val seen = new java.util.LinkedHashSet[java.lang.Long](
      2 * (1 + chars + chars * (chars - 1) / 2))
    seen.add(XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, m, Seed))
    val buf = new Array[Byte](m)
    // delete char a (and char b when b >= 0; b > a): ≤3 contiguous copies
    def addDeleted(a: Int, b: Int): Unit = {
      System.arraycopy(bytes, 0, buf, 0, offs(a))
      var p = offs(a)
      val endA = offs(a + 1)
      if (b < 0) {
        System.arraycopy(bytes, endA, buf, p, m - endA)
        p += m - endA
      } else {
        System.arraycopy(bytes, endA, buf, p, offs(b) - endA)
        p += offs(b) - endA
        val endB = offs(b + 1)
        System.arraycopy(bytes, endB, buf, p, m - endB)
        p += m - endB
      }
      seen.add(XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, p, Seed))
    }
    var a = 0
    while (a < chars) { addDeleted(a, -1); a += 1 }
    a = 0
    while (a < chars - 1) {
      var b = a + 1
      while (b < chars) { addDeleted(a, b); b += 1 }
      a += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }
}
