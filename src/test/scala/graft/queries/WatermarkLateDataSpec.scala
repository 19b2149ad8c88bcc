package graft.queries

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Watermark semantics proved deterministically, against the semantics
  * Spark ACTUALLY implements (measured on 4.1): in append mode a window
  * is emitted (finalized) at the end of the first batch whose STARTING
  * watermark passes the window end — one batch later than the textbook
  * "watermark advanced past it" phrasing — and a late row is dropped
  * only when its window has already been emitted (before that, it
  * merges silently even if it is older than the current watermark).
  * File mtimes + maxFilesPerTrigger=1 pin the batch order, so the test
  * is exact: batch 0 loads hours 0-10, batch 1 finalizes hours 0-8,
  * batch 2's hour-3 straggler hits a finalized window and MUST be
  * dropped — emitting it again would break append's
  * exactly-once-per-window contract (the state-bounding property that
  * lets a 100 TB stream run with finite window state).
  */
class WatermarkLateDataSpec extends SparkSpec {

  test("a straggler into an emitted window is dropped; windows emit exactly once") {
    import spark.implicits._
    val dir = Files.createTempDirectory("wm-late").toString
    try {
      def ts(h: Int, m: Int = 0): java.sql.Timestamp =
        java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // batch 0: hours 0..10, two rows in hour 3 → watermark 09:15
      val batch0 = ((0 to 10).map(h => (ts(h, 15), s"on-time-$h")) :+
        (ts(3, 45), "on-time-3b")).toDF("ts", "tag")
      // batch 1: hour 11 → end-of-batch eviction (wm 09:15) EMITS hours 0..8
      val batch1 = Seq((ts(11, 15), "on-time-11")).toDF("ts", "tag")
      // batch 2: hour-3 straggler (window already emitted → must drop)
      // + hour 12; final no-data batch evicts hours 9-10 (wm 11:15)
      val batch2 = Seq(
        (ts(3, 30), "late-3"),
        (ts(12, 15), "on-time-12")).toDF("ts", "tag")
      Seq(batch0, batch1, batch2).zipWithIndex.foreach { case (df, i) =>
        df.coalesce(1).write.parquet(s"$dir/b$i")
        val f = Files.list(Paths.get(dir, s"b$i"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val target = Paths.get(dir, s"$i.parquet")
        Files.move(f, target)
        Files.setLastModifiedTime(target, FileTime.fromMillis(1000000L + i * 60000L))
      }
      val src = spark.readStream.schema(batch0.schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
      val name = "wm_late_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = src.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("append").format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dropped = q.recentProgress.flatMap(_.stateOperators.headOption)
        .map(_.numRowsDroppedByWatermark).sum
      val rows = spark.table(name)
        .select(hour(col("window.start")).as("h"), col("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      val got = rows.toMap
      assert(rows.length === rows.map(_._1).distinct.length,
        s"a window was emitted twice: ${rows.toSeq.sorted}")
      assert(dropped === 1L, s"expected exactly the one straggler dropped, got $dropped")
      assert(got(3) === 2L, s"straggler leaked into finalized hour-3: $got")
      // final watermark 11:15 finalizes hours 0..10; 11 and 12 stay pending
      assert(got.keySet === (0 to 10).toSet, s"emitted windows: ${got.keySet}")
      (0 to 10).filter(_ != 3).foreach(h => assert(got(h) === 1L))
    } finally {
      graft.etl.LakeFs.deleteRecursively(spark,
        new org.apache.hadoop.fs.Path(dir))
    }
  }
}
