package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact upper-triangle outer-product sums for the covariance estimator
  * (`q_embed_covariance`): for a group of integer-quantized vectors q6,
  * accumulates Σ q6_i · q6_j for every cell i ≤ j of the d×d Gram
  * matrix in ONE array-typed aggregate.
  *
  * Replaces the declarative form — 2080 interpreted named_structs built
  * per ROW by nested transform/flatten HOFs, exploded into 41.6M rows at
  * sf0.1 and hash-aggregated — with a tight compiled loop per row and
  * map-side partial buffers (sum of 128-bit cells is associative and
  * commutative, so partial aggregation stays exact).
  *
  * Exactness at ARBITRARY coordinate scale without per-cell BigDecimal:
  * each product is computed as a full signed 128-bit value
  * (`Math.multiplyHigh` + low word) and accumulated into a per-cell
  * (hi, lo) pair with carry — two's-complement addition, so negative
  * products need no special casing. The buffer is indexed by
  * c = i·d + j (hi at 2c, lo at 2c+1), matching the declarative cell id.
  * The caller reconstructs each DECIMAL(38,0) sum as
  * hi·2⁶⁴ + unsigned(lo) — bit-identical to the oracle's HUGEINT sums
  * (the 128-bit accumulator overflows only past 2¹²⁷ ≈ 1.7e38, the same
  * ceiling DECIMAL(38,0) already imposed).
  */
class OuterProductSum(d: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](2 * d * d)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    // null or wrong-dimension rows contribute nothing (instead of NPE /
    // IndexOutOfBounds): the aggregate is defined over exactly-d vectors,
    // and callers that cannot prove that filter upstream
    if (v == null || v.length != d) return buf
    // IndexedSeq backed by a primitive array in practice; copy once so
    // the inner loop reads a flat long[]
    val a = new Array[Long](d)
    var t = 0
    while (t < d) { a(t) = v(t); t += 1 }
    var i = 0
    while (i < d) {
      val ai = a(i)
      var j = i
      while (j < d) {
        val lo = ai * a(j)
        val hi = Math.multiplyHigh(ai, a(j))
        val c = 2 * (i * d + j)
        val nlo = buf(c + 1) + lo
        // unsigned carry out of the low word
        val carry = if (java.lang.Long.compareUnsigned(nlo, buf(c + 1)) < 0) 1L else 0L
        buf(c) = buf(c) + hi + carry
        buf(c + 1) = nlo
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var c = 0
    while (c < x.length) {
      val nlo = x(c + 1) + y(c + 1)
      val carry = if (java.lang.Long.compareUnsigned(nlo, x(c + 1)) < 0) 1L else 0L
      x(c) = x(c) + y(c) + carry
      x(c + 1) = nlo
      c += 2
    }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
