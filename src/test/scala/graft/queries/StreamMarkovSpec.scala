package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, expr}

import graft.SparkSpec

/** The streaming transition counter must be micro-batch-split invariant
  * under time-ordered ingest: feeding the event log as two time-split
  * files (all earlier events first — the daily-ingest arrival order)
  * must reproduce the single-batch transition counts exactly, because
  * per-user state carries the last event across the boundary.
  */
class StreamMarkovSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def counts(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Long)] =
    df.collect().toSeq.map { r: Row =>
      (r.getString(0), r.getString(1), r.getLong(2)) }

  test("two time-ordered micro-batches == one batch == batch query counts") {
    // normalized raw read keeps ts as epoch-nanos LONG — the stream
    // code's layout — whatever the testdata's physical ts type
    val events = graft.Tables.eventsNanos(spark, sf).persist()
    val midNanos = events.selectExpr("percentile_approx(ts, 0.5)")
      .collect()(0).getLong(0)
    val dir = Files.createTempDirectory("stream-markov").toString
    try {
      events.filter(col("ts") <= midNanos).coalesce(1)
        .write.parquet(s"$dir/batch_a")
      events.filter(col("ts") > midNanos).coalesce(1)
        .write.parquet(s"$dir/batch_b")
      val files = Seq("batch_a", "batch_b").zipWithIndex.map { case (d, i) =>
        val f = Files.list(Paths.get(dir, d))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val target = Paths.get(dir, s"$i.parquet")
        Files.move(f, target)
        Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
        target
      }
      assert(files.size == 2)
      val twoBatches = counts(StreamingQueries.streamMarkov(
        spark, dir, "*.parquet", maxFilesPerTrigger = Some(1)))
      val oneBatch = counts(StreamingQueries.streamMarkov(
        spark, dir, "*.parquet", maxFilesPerTrigger = None))
      assert(twoBatches.nonEmpty)
      assert(twoBatches === oneBatch, "micro-batch split changed the counts")
      // and both agree with the batch transition matrix (counts columns)
      val batch = AnalyticsQueries.qMarkovTransitions(spark, sf)
        .select(col("prev_type"), col("next_type"), col("n"))
      assert(twoBatches === counts(batch))
    } finally {
      events.unpersist()
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(dir))
    }
  }
}
