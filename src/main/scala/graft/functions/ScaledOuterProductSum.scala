package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Upper-triangle outer-product sums with q_pca_power's per-cell half-up
  * micro-unit rescale: each cell accumulates
  * `sign(p) · ((2·|p| + div) / (2·div))` for p = q6_i·q6_j — exactly the
  * declarative `CASE WHEN p >= 0 THEN (2*p + div) div (2*div) ELSE ...`
  * it replaces (plain BIGINT arithmetic, the documented headroom
  * contract: |term| is ~1e6-scale so a long sum holds ~9e12 rows;
  * [[OuterProductSum]] remains the arbitrary-scale exact form). Buffer
  * is one long per cell, indexed c = i·d + j; map-side partials stay
  * exact because long addition is associative/commutative.
  */
class ScaledOuterProductSum(d: Int, div: Long)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](d * d)

  override def reduce(buf: Array[Long], v: Seq[Long]): Array[Long] = {
    // same contract guard as OuterProductSum: null / wrong-dimension rows
    // are skipped, never NPE
    if (v == null || v.length != d) return buf
    val a = new Array[Long](d)
    var t = 0
    while (t < d) { a(t) = v(t); t += 1 }
    var i = 0
    while (i < d) {
      val ai = a(i)
      var j = i
      while (j < d) {
        val p = ai * a(j)
        val term =
          if (p >= 0) (2 * p + div) / (2 * div)
          else -((2 * -p + div) / (2 * div))
        buf(i * d + j) += term
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var c = 0
    while (c < x.length) { x(c) += y(c); c += 1 }
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
