package graft.etl

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Incremental semantics pinned to the reference loop
  * (SURVEY.md §2.9 ST1–ST5; etl/daily_load/violation_etl_daily.py:120-146,
  * 332-351).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ld(s: String) = LocalDate.parse(s)

  test("range: cold start on empty sink (ST3)") {
    assert(Incremental.range(None, ld("2024-09-01"), ld("2024-09-05"))
      .contains((ld("2024-09-01"), ld("2024-09-04"))))
  }

  test("range: resumes at watermark + 1, ends yesterday (ST1/ST2)") {
    assert(Incremental.range(Some(ld("2024-10-10")), ld("2024-09-01"), ld("2024-10-14"))
      .contains((ld("2024-10-11"), ld("2024-10-13"))))
  }

  test("range: up to date -> None (early exit)") {
    assert(Incremental.range(Some(ld("2024-10-13")), ld("2024-09-01"), ld("2024-10-14"))
      .isEmpty)
    assert(Incremental.range(Some(ld("2024-10-20")), ld("2024-09-01"), ld("2024-10-14"))
      .isEmpty)
  }

  test("watermark: probes MAX(date) from the lake; None when absent/empty") {
    val path = Files.createTempDirectory("graft-wm").resolve("t").toString
    assert(Incremental.watermark(spark, path, "violation_date").isEmpty)
    Seq(("a", java.sql.Date.valueOf("2024-10-01")),
      ("b", java.sql.Date.valueOf("2024-10-03")))
      .toDF("violation_id", "violation_date").write.parquet(path)
    assert(Incremental.watermark(spark, path, "violation_date")
      .contains(ld("2024-10-03")))
  }

  test("run: loads each day in range through the sink, isolates failures (ST4)") {
    val path = Files.createTempDirectory("graft-run").resolve("t").toString
    def day(d: LocalDate): DataFrame =
      Seq((s"id_$d", java.sql.Date.valueOf(d))).toDF("violation_id", "violation_date")
    def failingFetch(d: LocalDate): DataFrame =
      if (d == ld("2024-10-02")) throw new RuntimeException("api down")
      else day(d)
    val report = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld("2024-10-05"),
      fetchDay = failingFetch,
      sink = (df, _) => Sinks.insertIgnore(spark, df, path, Seq("violation_id")))
    assert(report.loaded == Seq(ld("2024-10-01"), ld("2024-10-03"), ld("2024-10-04")))
    assert(report.failed.map(_._1) == Seq(ld("2024-10-02")))
    assert(!report.skipped)
    // faithful gap semantics (§8.4): watermark is now past the failed day,
    // so the next run skips it — the gap persists
    assert(Incremental.watermark(spark, path, "violation_date")
      .contains(ld("2024-10-04")))
    val second = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld("2024-10-05"),
      fetchDay = day, sink = (df, _) =>
        Sinks.insertIgnore(spark, df, path, Seq("violation_id")))
    assert(second.skipped)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("run: backfillGaps retries the failed day on the next run (§8.4 opt-in)") {
    val path = Files.createTempDirectory("graft-bf").resolve("t").toString
    def day(d: LocalDate): DataFrame =
      Seq((s"id_$d", java.sql.Date.valueOf(d))).toDF("violation_id", "violation_date")
    def failingFetch(d: LocalDate): DataFrame =
      if (d == ld("2024-10-02")) throw new RuntimeException("api down")
      else day(d)
    // run 1: 10-02 fails, 10-03/10-04 succeed -> watermark passes the gap
    val first = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld("2024-10-05"),
      fetchDay = failingFetch,
      sink = (df, _) => Sinks.insertIgnore(spark, df, path, Seq("violation_id")),
      backfillGaps = true)
    assert(first.failed.map(_._1) == Seq(ld("2024-10-02")))
    assert(Incremental.gaps(spark, path, "violation_date", ld("2024-10-01"))
      == Seq(ld("2024-10-02")))
    // run 2 (API healthy, nothing new above the watermark): refills the gap
    val second = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld("2024-10-05"),
      fetchDay = day,
      sink = (df, _) => Sinks.insertIgnore(spark, df, path, Seq("violation_id")),
      backfillGaps = true)
    assert(!second.skipped && second.loaded == Seq(ld("2024-10-02")))
    assert(Incremental.gaps(spark, path, "violation_date", ld("2024-10-01")).isEmpty)
    assert(spark.read.parquet(path).count() == 4)
    // run 3: gap filled, nothing new -> clean skip (and without the
    // opt-in the default faithful semantics never touched the gap)
    val third = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld("2024-10-05"),
      fetchDay = day,
      sink = (df, _) => Sinks.insertIgnore(spark, df, path, Seq("violation_id")),
      backfillGaps = true)
    assert(third.skipped)
  }

  test("run: second run resumes from watermark and is idempotent (ST5)") {
    val path = Files.createTempDirectory("graft-run2").resolve("t").toString
    def day(d: LocalDate): DataFrame =
      Seq((s"id_$d", java.sql.Date.valueOf(d))).toDF("violation_id", "violation_date")
    def go(today: String) = Incremental.run(spark, path, "violation_date",
      coldStart = ld("2024-10-01"), today = ld(today),
      fetchDay = day, sink = (df, _) =>
        Sinks.insertIgnore(spark, df, path, Seq("violation_id")))
    assert(go("2024-10-03").loaded.size == 2) // 10-01, 10-02
    assert(go("2024-10-05").loaded == Seq(ld("2024-10-03"), ld("2024-10-04")))
    assert(spark.read.parquet(path).count() == 4)
  }
}
