package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The streaming as-of must be micro-batch-split invariant under
  * time-ordered ingest: per-user state carries the last click across
  * the batch boundary, so feeding the log as two time-split files
  * reproduces the single-batch pairs exactly — which in turn equal the
  * batch union+window and native-exec results on the matched subset.
  */
class StreamAsofSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map((r: Row) => r.toSeq)

  test("two time-ordered micro-batches == one batch == batch as-of pairs") {
    val events = graft.Tables.eventsNanos(spark, sf).persist()
    val midNanos = events.selectExpr("percentile_approx(ts, 0.5)")
      .collect()(0).getLong(0)
    val dir = Files.createTempDirectory("stream-asof").toString
    try {
      events.filter(col("ts") <= midNanos).coalesce(1)
        .write.parquet(s"$dir/batch_a")
      events.filter(col("ts") > midNanos).coalesce(1)
        .write.parquet(s"$dir/batch_b")
      Seq("batch_a", "batch_b").zipWithIndex.foreach { case (d, i) =>
        val f = Files.list(Paths.get(dir, d))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val target = Paths.get(dir, s"$i.parquet")
        Files.move(f, target)
        Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
      }
      val split = rows(StreamingQueries.streamAsof(
        spark, dir, "*.parquet", Some(1)))
      val single = rows(StreamingQueries.qStreamAsof(spark, sf))
      assert(split.nonEmpty)
      assert(split == single)
      // and the stream's pairs equal the batch as-of restricted to
      // purchases with a match
      val batch = rows(PipelineQueries.qAsofJoin(spark, sf)
        .filter(col("click_id").isNotNull))
      assert(single == batch)
    } finally {
      events.unpersist()
    }
  }
}
