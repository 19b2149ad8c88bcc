package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items ("heavy hitters") sketch as a typed
  * Aggregator: at most `k` counters, so the state is O(k) regardless of
  * input size — the 100 TB answer to "which keys dominate this column"
  * without a full groupBy of the tail.
  *
  * Guarantee (Misra & Gries 1982): every key whose true frequency
  * exceeds N/k survives in the final counter set; counts are
  * underestimates by at most N/k. The merge follows Agarwal et al.,
  * "Mergeable Summaries" (PODS'12 §3): sum counters pairwise, then
  * subtract the (k+1)-th largest counter value from all and keep the
  * positive ones — associative/commutative, so map-side partial
  * aggregation stays correct under any partitioning.
  *
  * The sketch CONTENTS are order/partitioning-dependent for tail keys
  * (like any MG instance), but the guarantee above is deterministic —
  * queries gate on the guarantee, not on tail membership.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  require(k >= 1, "MisraGries needs at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // full and x unseen: decrement every counter (x's implicit +1
        // cancels against one decrement), dropping zeros
        b.flatMap { case (key, c) =>
          if (c > 1L) Some(key -> (c - 1L)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest counter from all, keep positives:
      // at most k survive and each true count drops by <= N/k in total
      val cut = summed.values.toArray.sortBy(-_).apply(k)
      summed.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  /** Sorted key list — the candidate heavy-hitter set. */
  override def finish(b: Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
