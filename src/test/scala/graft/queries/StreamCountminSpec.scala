package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The streaming count-min grid must be EXACTLY split-invariant: cell
  * values are sums, summing is the merge, so any micro-batch split of
  * the corpus yields the identical sketch — and therefore identical
  * point estimates. This is a stronger property than the heavy-hitter
  * sketch's (whose tail membership is arrival-order-specific), and it is
  * why the stream form shares the batch form's exact-value oracle.
  */
class StreamCountminSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def asRows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
    df.collect().toSeq.map { r: Row =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }

  test("three micro-batches == one batch, and equals the batch query") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").persist()
    val dir = Files.createTempDirectory("stream-countmin").toString
    try {
      Seq(0L -> 170L, 170L -> 340L, 340L -> 9999L).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi).coalesce(1)
            .write.parquet(s"$dir/b$i")
          val f = Files.list(Paths.get(dir, s"b$i"))
            .filter(_.toString.endsWith(".parquet")).findFirst().get()
          val target = Paths.get(dir, s"$i.parquet")
          Files.move(f, target)
          Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
      }
      val split = asRows(StreamingQueries.streamCountmin(
        spark, dir, "*.parquet", maxFilesPerTrigger = Some(1)))
      val whole = asRows(StreamingQueries.streamCountmin(
        spark, dir, "*.parquet"))
      val batch = asRows(CurationQueries.qCountmin(spark, sf))
      assert(split.nonEmpty)
      assert(split === whole, "micro-batch split changed the sketch")
      assert(split === batch, "streamed sketch diverged from the batch sketch")
      split.foreach { case (tok, cnt, est, over) =>
        assert(est >= cnt, s"$tok: one-sided error violated")
        assert(over === est - cnt)
      }
    } finally {
      docs.unpersist()
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(dir))
    }
  }
}
