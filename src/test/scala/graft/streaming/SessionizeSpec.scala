package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** The streaming sessionizer must emit exactly the sessions the batch
  * window formulation computes. A flush file (one far-future event per
  * user, arriving as a later micro-batch) closes every real session, so
  * streamed-closed == batch-all for the original data.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionization equals the batch lag+cumsum form") {
    val sf = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("sess-stream")

    // real events first (earlier mtime), flush file second
    Files.copy(Paths.get(s"$sf/events.parquet"),
      dir.resolve("a_events.parquet"), StandardCopyOption.COPY_ATTRIBUTES)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$sf/events.parquet")
    val maxTs = events.agg(max(col("ts"))).collect()(0).getLong(0)
    val flush = events.select(col("user_id")).distinct()
      .select(
        (col("user_id") + 1000000L).as("event_id"),
        lit(maxTs + 86400L * 1000000000L).as("ts"), // +1 day, nanos
        col("user_id"),
        lit("flush").as("event_type"),
        lit(0.0).as("value"),
        lit("{}").as("props"))
    flush.coalesce(1).write.mode("overwrite").parquet(dir.resolve("tmpw").toString)
    val part = new java.io.File(dir.resolve("tmpw").toString)
      .listFiles().find(_.getName.endsWith(".parquet")).get
    val flushTarget = dir.resolve("b_flush.parquet")
    Files.move(part.toPath, flushTarget)
    // later modification time -> processed as the second micro-batch
    flushTarget.toFile.setLastModified(
      new java.io.File(dir.resolve("a_events.parquet").toString).lastModified() + 600000L)

    val streamed = Sessionize.sessionizeStream(spark, dir.toString)
      .orderBy(col("user_id"), col("session_id"))
      .collect().map(_.toSeq)

    val batch = RelationalQueries.qSessionize(spark, sf)
      .collect().map(_.toSeq)

    assert(streamed.length == batch.length)
    assert(streamed.toSeq == batch.toSeq)
  }
}
