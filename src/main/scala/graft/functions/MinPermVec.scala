package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** MinHash signature as ONE array-typed aggregate: for each of the K
  * multiply-mod permutations `(a_i * x + b_i) % p`, keeps the running
  * minimum across the group's shingle hashes.
  *
  * Replaces K separate `min(expr)` columns: the buffer is a single
  * primitive long[K] updated in a tight loop (no K-column agg rows, no K
  * generated projection expressions), and map-side partial aggregation
  * stays exact — elementwise min is associative and commutative. Same
  * portable arithmetic as the column form, so the DuckDB oracle's
  * per-column mins reproduce it bit-for-bit.
  */
class MinPermVec(as: Array[Long], bs: Array[Long], p: Long)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  private val k = as.length
  require(bs.length == k, "permutation coefficient arrays must align")

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val v = (as(i) * x + bs(i)) % p
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
