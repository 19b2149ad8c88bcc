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

  test("pack spans: every non-terminal sequence holds exactly the budget; spans tile each doc") {
    val rows = PipelineQueries.qPackSpans(spark, "/root/testdata/sf0.001")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // per (lang, shard, seq): sum of span lengths == 4096, except the
    // stream's terminal sequence which may run short
    rows.groupBy(t => (t._1, t._3)).foreach { case ((key, seq), spans) =>
      val total = spans.map(s => s._5 - s._4).sum
      val lastSeq = rows.filter(_._1 == key).map(_._3).max
      if (seq < lastSeq) assert(total == 4096L, s"$key seq $seq: $total")
      else assert(total <= 4096L, s"$key terminal seq $seq: $total")
    }
    // per doc: spans are contiguous from 0 and tile the whole token count
    val packed = PipelineQueries.qPackSequences(spark, "/root/testdata/sf0.001")
      .groupBy().agg(sum(col("total_tokens"))).collect().head.getLong(0)
    assert(rows.map(s => s._5 - s._4).sum == packed) // no token lost or duplicated
    rows.groupBy(_._2).foreach { case (doc, spans) =>
      val ordered = spans.sortBy(_._4)
      assert(ordered.head._4 == 0L, s"doc $doc")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"doc $doc gap")
        case _ =>
      }
      // consecutive seq ids: a straddling doc continues in the NEXT sequence
      assert(ordered.map(_._3).toSeq ==
        (ordered.head._3 until ordered.head._3 + ordered.length).toSeq, s"doc $doc")
    }
  }

  test("salted decontaminate: identical result to the broadcast path; plan carries the salt") {
    val dir = "/root/testdata/sf0.001"
    val base = PipelineQueries.qDecontaminate(spark, dir).collect().toSeq
    val salted = PipelineQueries.qDecontaminateSkew(spark, dir).collect().toSeq
    assert(base.nonEmpty)
    assert(salted == base)
    val plan = PipelineQueries.qDecontaminateSkew(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), "salted join key missing from the optimized plan")
  }

  test("epoch shuffle: a permutation — shards partition the corpus, pos contiguous, order decorrelated from doc_id") {
    val dir = "/root/testdata/sf0.01"
    val rows = PipelineQueries.qShuffleShard(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    // every doc exactly once
    assert(rows.length.toLong == nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet.size.toLong == nDocs)
    // in-shard positions are 1..size with no gaps
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (s, rs) =>
      val ps = rs.map(_.getAs[Int]("pos")).sorted
      assert(ps.head == 1 && ps.last == ps.length, s"shard $s positions not contiguous")
    }
    // hash balance: no shard more than 2x the ideal size at 500 docs
    val sizes = rows.groupBy(_.getAs[Int]("shard")).values.map(_.length)
    assert(sizes.max <= 2 * (nDocs.toInt / PipelineQueries.shuffleShardCount + 1))
    // the shuffle actually shuffles: within a shard, consecutive
    // positions are not consecutive doc_ids (a sorted-by-id "shuffle"
    // would be a layout-dependent non-shuffle)
    val firstShard = rows.filter(_.getAs[Int]("shard") == 0).sortBy(_.getAs[Int]("pos"))
    val idOrdered = firstShard.map(_.getAs[Long]("doc_id"))
    assert(idOrdered.sliding(2).count(p => p(1) == p(0) + 1) < idOrdered.length / 4)
  }

  test("z-order files are tight boxes in BOTH dimensions (the skipping guarantee)") {
    val dir = "/root/testdata/sf0.01"
    val rows = PipelineQueries.qZorderLayout(spark, dir).collect()
    assert(rows.nonEmpty)
    // a z>>9 prefix fixes the top 3 user bits and top 4 day bits, so
    // every file's bounding box is AT MOST 32 users x 16 days — the
    // structural guarantee single-column sorting cannot give (a
    // user-sorted layout leaves day spans at the full domain)
    rows.foreach { r =>
      assert(r.getAs[Int]("max_user") - r.getAs[Int]("min_user") <= 31,
        s"file ${r.getAs[Int]("z_file")} user span escaped its z-prefix box")
      assert(r.getAs[Int]("max_day") - r.getAs[Int]("min_day") <= 15,
        s"file ${r.getAs[Int]("z_file")} day span escaped its z-prefix box")
    }
    // the layout is a partition of the corpus, not a sample
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total == graft.Tables.events(spark, dir).count())
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
