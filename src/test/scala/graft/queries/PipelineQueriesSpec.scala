package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics for the pipeline operators — the oracle gate proves
  * engine agreement on real data; these pin the EDGE semantics on
  * hand-crafted rows (ties, no-match, duplicate timestamps) and the
  * structural invariants the oracle comparison can't articulate.
  */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join: at-or-before tie matches, no-prior-click is null, dup ts dedupes") {
    val dir = Files.createTempDirectory("asof").toString
    def ns(sec: Long): Long = sec * 1000000000L
    Seq(
      // (event_id, ts nanos, user_id, event_type, value, props)
      (100L, ns(10), 1L, "click", 0.0, "{}"),
      (101L, ns(10), 1L, "click", 0.0, "{}"), // same ts: max id (101) wins
      (200L, ns(10), 1L, "purchase", 0.0, "{}"), // tie -> at-or-before matches
      (201L, ns(5), 1L, "purchase", 0.0, "{}"), // before any click -> null
      (102L, ns(20), 1L, "click", 0.0, "{}"),
      (202L, ns(25), 1L, "purchase", 0.0, "{}"), // -> click 102, lag 5s
      (300L, ns(50), 2L, "purchase", 0.0, "{}")) // user with no clicks
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = PipelineQueries.qAsofJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (200L, 1L, Some(101L), Some(0L)),
      (201L, 1L, None, None),
      (202L, 1L, Some(102L), Some(5000L)),
      (300L, 2L, None, None)))
  }

  test("sequence packing: seq ids contiguous from 0; prefix sums respect the budget") {
    val rows = PipelineQueries.qPackSequences(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (key, seqs) =>
      val ordered = seqs.sortBy(_._2)
      // contiguous sequence ids starting at 0
      assert(ordered.map(_._2).toSeq == (0L until ordered.length).toSeq, s"$key")
      // exclusive-prefix rule: everything packed before sequence s fills
      // at least s whole budgets (a doc lands in s only once s*B is crossed)
      ordered.map(_._3).scanLeft(0L)(_ + _).zipWithIndex.tail.dropRight(1)
        .foreach { case (prefix, s) => assert(prefix >= s * 4096L, s"$key seq $s") }
    }
  }

  test("quantization: codes bounded by int8 range, checksums consistent") {
    val rows = PipelineQueries.qEmbedQuantize(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, qSum, qL1, qMax) = (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(scale >= 0.0)
      assert(qMax <= 127L)
      assert(qL1 >= math.abs(qSum)) // L1 dominates the signed sum
      assert(qL1 >= qMax)
    }
  }
}
