package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Gap-based sessionization as a stateful streaming operator
  * (`flatMapGroupsWithState`): per-user state carries the open session;
  * an event beyond the inactivity gap closes it (emitted downstream) and
  * opens the next. This maintains incrementally exactly what the batch
  * window formulation (RelationalQueries.qSessionize: lag + running sum)
  * computes over the full history — the spec pins the two against each
  * other.
  *
  * Gap arithmetic uses millisecond-truncated timestamps with a strict
  * `> gapMs` comparison, bit-matching the batch form's
  * `unix_millis(ts) - lag(...) > 1800000`.
  *
  * Open sessions stay in state until a later event closes them (AvailableNow
  * with no further input leaves the trailing session unemitted — streaming
  * semantics: it could still grow).
  */
object Sessionize {

  case class RawEvent(event_id: Long, ts: Long, user_id: Long,
      event_type: String, value: Double, props: String)
  case class OpenSession(startMs: Long, lastMs: Long, n: Long, idx: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Long,
      session_start: String, session_end: String)

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos read raw
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def fmt(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Runs the streaming sessionizer over a directory of events-schema
    * parquet files (AvailableNow; `maxFilesPerTrigger=1` so multi-file
    * inputs arrive as ordered micro-batches) and returns the CLOSED
    * sessions.
    */
  def sessionizeStream(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val gapMs = gapMinutes * 60000L
    val src = spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[RawEvent]
    val sessions = src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[RawEvent], state: GroupState[OpenSession]) =>
          // within a micro-batch events are unordered: establish event time
          val evs = events.toVector.sortBy(e => (e.ts, e.event_id))
          val closed = Vector.newBuilder[Session]
          var open = state.getOption
          evs.foreach { e =>
            val ms = e.ts / 1000000L // nanos -> ms (truncating, like unix_millis)
            open match {
              case Some(s) if ms - s.lastMs > gapMs =>
                closed += Session(user, s.idx, s.n, fmt(s.startMs), fmt(s.lastMs))
                open = Some(OpenSession(ms, ms, 1, s.idx + 1))
              case Some(s) =>
                open = Some(s.copy(lastMs = math.max(s.lastMs, ms), n = s.n + 1))
              case None =>
                open = Some(OpenSession(ms, ms, 1, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
    val name = "sessions_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = sessions.writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
