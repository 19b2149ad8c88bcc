package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-dimension decimal sums of a vector column in ONE aggregation pass
  * — the Lloyd re-average's shuffle reducer (optimization r15).
  *
  * Replaces the posexplode → groupBy(cid, pos) → sum(DECIMAL) →
  * groupBy(cid) collect_list chain: that shape shuffles d rows per
  * vector (64× fan-out) through TWO exchanges per training iteration,
  * where this aggregate ships one partial array per group per map
  * partition through one exchange (guide §2.3 "aggregate before you
  * shuffle").
  *
  * Arithmetic contract (bit-identical to the declarative form, pinned by
  * VecMicroSumSpec): each element contributes
  * `CAST(round(x, 6) AS DECIMAL)` — reproduced here as
  * BigDecimal.valueOf(x).setScale(6, HALF_UP), the exact semantics of
  * Spark's Round(double, 6) + decimal cast — accumulated as an exact
  * long in micro-units (|x| ~ 1e6-scale after rounding, so a long holds
  * ~9e12 rows of headroom, the ScaledOuterProductSum contract). The
  * output re-attaches scale 6, so `CAST(sx AS DOUBLE)` downstream is the
  * correctly-rounded double of the same rational the decimal sum gave.
  *
  * Null / wrong-dimension rows are SKIPPED and excluded from the
  * returned count (`_2`), so the caller's mean divides by exactly the
  * rows summed.
  */
class VecMicroSum(d: Int)
    extends Aggregator[Seq[Double], (Array[Long], Long), (Seq[BigDecimal], Long)] {

  override def zero: (Array[Long], Long) = (new Array[Long](d), 0L)

  override def reduce(buf: (Array[Long], Long), v: Seq[Double]): (Array[Long], Long) = {
    if (v == null || v.length != d) return buf
    var i = 0
    while (i < d) {
      buf._1(i) += JBigDecimal.valueOf(v(i))
        .setScale(6, RoundingMode.HALF_UP).unscaledValue().longValueExact()
      i += 1
    }
    (buf._1, buf._2 + 1)
  }

  override def merge(x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
    var i = 0
    while (i < d) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(buf: (Array[Long], Long)): (Seq[BigDecimal], Long) =
    (buf._1.toSeq.map(l => BigDecimal(l, 6)), buf._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    ExpressionEncoder[(Array[Long], Long)]()
  override def outputEncoder: Encoder[(Seq[BigDecimal], Long)] =
    ExpressionEncoder[(Seq[BigDecimal], Long)]()
}
