package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Signed per-bit popcount: for each of `bits` bit positions j, sums
  * `((hx >> j) & 1) * 2 - 1` (+1 if the bit is set, -1 if not) across the
  * group — the SimHash accumulation step, fused into ONE array-typed
  * aggregate instead of `bits` separate sum columns.
  *
  * Scale rationale: a 60-column sum aggregate materializes the widest agg
  * rows in the engine (60 boxed counters per hash-map slot, 60 codegen'd
  * update paths); this buffer is a single primitive long[] updated in a
  * tight loop, and the shuffle carries one array value per (doc, partial)
  * instead of 60 columns. Elementwise integer addition is associative and
  * commutative, so partial (map-side) aggregation stays exact and
  * order-insensitive — the same portable arithmetic as the column form,
  * bit-for-bit reproducible by the DuckDB oracle's per-column sums.
  */
class SignedBitSum(bits: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(buf: Array[Long], hx: Long): Array[Long] = {
    var j = 0
    while (j < bits) {
      buf(j) += ((hx >>> j) & 1L) * 2L - 1L
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) {
      a(j) += b(j)
      j += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
