package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec


/** Streaming near-dedup must be incremental-safe: feeding the corpus as
  * two micro-batches (older ids first — the daily-ingest arrival order)
  * must produce exactly the single-batch answer, because per-bucket state
  * carries the minimum doc_id across batches.
  */
class StreamNearDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def asRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().toSeq.map { r: Row => (r.getLong(0), r.getLong(1)) }

  test("two monotone micro-batches == one batch") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").persist()
    val mid = 250L // sf0.01 has doc_id 0..499
    val dir = Files.createTempDirectory("stream-neardedup").toString
    try {
      docs.filter(col("doc_id") < mid).coalesce(1)
        .write.parquet(s"$dir/batch_a")
      docs.filter(col("doc_id") >= mid).coalesce(1)
        .write.parquet(s"$dir/batch_b")
      // one file per batch, under one listing dir; distinct mtimes force
      // the file source to process batch_a strictly before batch_b
      val files = Seq("batch_a", "batch_b").zipWithIndex.map { case (d, i) =>
        val f = Files.list(Paths.get(dir, d))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val target = Paths.get(dir, s"$i.parquet")
        Files.move(f, target)
        Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
        target
      }
      assert(files.size == 2)
      val twoBatches = asRows(StreamingQueries.streamNearDedup(
        spark, dir, "*.parquet", maxFilesPerTrigger = Some(1)))
      val oneBatch = asRows(StreamingQueries.streamNearDedup(
        spark, dir, "*.parquet"))
      assert(twoBatches.nonEmpty)
      assert(twoBatches === oneBatch)
    } finally {
      docs.unpersist()
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(dir))
    }
  }

  test("streaming contamination: two micro-batches == one batch") {
    // the static benchmark side is fixed at query start, and the
    // Complete-mode per-doc counts accumulate across batches — so batch
    // splitting must not change the flagged set
    val docs = spark.read.parquet(s"$sf/documents.parquet").persist()
    val dir = Files.createTempDirectory("stream-contam").toString
    try {
      docs.filter(col("doc_id") < 250L).coalesce(1)
        .write.parquet(s"$dir/batch_a")
      docs.filter(col("doc_id") >= 250L).coalesce(1)
        .write.parquet(s"$dir/batch_b")
      Seq("batch_a", "batch_b").zipWithIndex.foreach { case (d, i) =>
        val f = Files.list(Paths.get(dir, d))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val target = Paths.get(dir, s"$i.parquet")
        Files.move(f, target)
        Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
      }
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
        df.collect().toSeq.map { r: Row => (r.getLong(0), r.getLong(1)) }
      val split = rows(StreamingQueries.streamContam(
        spark, dir, "*.parquet", maxFilesPerTrigger = Some(1)))
      val whole = rows(StreamingQueries.streamContam(spark, dir, "*.parquet"))
      assert(split.nonEmpty && split === whole)
    } finally {
      docs.unpersist()
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(dir))
    }
  }
}
