package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** ST5 for STREAMS: a stateful streaming query stopped and restarted
  * against a real checkpoint directory must produce exactly the output of
  * the uninterrupted run — state (per-bucket min doc_id) restores from
  * the state store, the source resumes from the committed offset (no
  * reprocessing), and the file sink's transaction log keeps output
  * exactly-once. This is the streaming twin of DEPLOYMENT.md:244-249's
  * double-run idempotency check on the batch sinks.
  */
class StreamCheckpointRecoverySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Stage the sf0.01 documents as two single-file batches with ordered
    * mtimes (older ids first — the daily-ingest arrival order).
    */
  private def stageTwoFiles(dir: String): Unit = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.filter(col("doc_id") < 250L).coalesce(1).write.parquet(s"$dir/batch_a")
    docs.filter(col("doc_id") >= 250L).coalesce(1).write.parquet(s"$dir/batch_b")
    Seq("batch_a", "batch_b").zipWithIndex.foreach { case (d, i) =>
      val f = Files.list(Paths.get(dir, d))
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      val target = Paths.get(dir, s"staged_$i.parquet")
      Files.move(f, target)
      Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
    }
  }

  /** One query lifetime: near-dedup emits from `in` (only files matching
    * `glob`) into a parquet sink at `out` with checkpoint `chk`,
    * AvailableNow (drain what's visible, then stop = a controlled
    * shutdown point).
    */
  private def runOnce(in: String, glob: String, out: String, chk: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val emits = StreamingQueries.nearDedupEmits(
        spark, StreamingQueries.docsStream(spark, in, glob))
      val q = emits.toDF().writeStream
        .outputMode(OutputMode.Append())
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.shuffle.partitions", v)
      case None => spark.conf.unset("spark.sql.shuffle.partitions")
    }
  }

  private def rollup(out: String): Seq[(Long, Long)] =
    spark.read.parquet(out)
      .filter(col("hit"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_bands"))
      .orderBy(col("doc_id"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  test("stateful near-dedup restarted from a checkpoint equals the uninterrupted run") {
    val root = Files.createTempDirectory("chk-recovery").toString
    val in = s"$root/in"; Files.createDirectories(Paths.get(in))
    stageTwoFiles(in)

    // interrupted run: lifetime 1 sees only file 0 (glob), stops; file 1
    // "arrives"; lifetime 2 RESTARTS from the same checkpoint and must
    // resume — restoring every (band, hash) bucket's min-id state — not
    // restart from scratch
    val out1 = s"$root/out_restart"; val chk1 = s"$root/chk_restart"
    runOnce(in, "staged_0.parquet", out1, chk1)
    val afterFirst = spark.read.parquet(out1).count()
    assert(afterFirst > 0)
    runOnce(in, "staged_*.parquet", out1, chk1)

    // uninterrupted control: both files visible to a single lifetime
    val out2 = s"$root/out_whole"; val chk2 = s"$root/chk_whole"
    runOnce(in, "staged_*.parquet", out2, chk2)

    val restarted = rollup(out1)
    val whole = rollup(out2)
    assert(restarted.nonEmpty)
    assert(restarted === whole)

    // exactly-once at the row level, not just in the rollup: the restart
    // neither reprocessed file 0 (committed offsets) nor dropped rows
    assert(spark.read.parquet(out1).count() === spark.read.parquet(out2).count())

    // non-vacuousness: the post-restart batch contributed flagged docs,
    // so the equality above actually exercised cross-restart state (if
    // the restart had rebuilt empty state, those docs' floors from
    // lifetime 1 would be gone and the rollups would diverge)
    val postRestartFlagged = restarted.collect { case (id, _) if id >= 250L => id }
    assert(postRestartFlagged.nonEmpty,
      "no post-restart doc was flagged — the recovery assertion would be vacuous")

    graft.etl.LakeFs.deleteRecursively(spark, new org.apache.hadoop.fs.Path(root))
  }
}
