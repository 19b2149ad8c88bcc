package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sink semantics pinned to the reference (SURVEY.md §2.1 S7/S8, §8.3)
  * including the DEPLOYMENT.md:244-249 idempotency requirement.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sink").resolve("t").toString

  private def read(path: String): DataFrame = spark.read.parquet(path)

  private def asMap(path: String): Map[String, Double] =
    read(path).collect().map(r =>
      r.getAs[String]("violation_id") -> r.getAs[Double]("fine_amount")).toMap

  private def batch(rows: (String, Double, Int, String)*): DataFrame =
    rows.toDF("violation_id", "fine_amount", "seq", "month")

  test("upsert: last-writer-wins on key collision (ON DUPLICATE KEY UPDATE)") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    Sinks.upsert(spark, batch(("b", 20.0, 1, "2024-09"), ("c", 3.0, 1, "2024-10")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0))
  }

  test("upsert: idempotent — same batch twice equals once") {
    val path = tmpDir()
    val b = batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09"))
    Sinks.upsert(spark, b, path, Seq("violation_id"), tiebreak = Some("seq"))
    val once = asMap(path)
    Sinks.upsert(spark, b, path, Seq("violation_id"), tiebreak = Some("seq"))
    assert(asMap(path) == once)
    assert(read(path).count() == 2)
  }

  test("upsert: batch-internal duplicates resolve by tiebreak (keep-last)") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-09"), ("a", 9.0, 1, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    assert(asMap(path) == Map("a" -> 9.0))
  }

  test("insert-ignore: first-writer-wins (INSERT IGNORE)") {
    val path = tmpDir()
    Sinks.insertIgnore(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    Sinks.insertIgnore(spark, batch(("b", 99.0, 1, "2024-09"), ("c", 3.0, 1, "2024-10")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
  }

  test("insert-ignore: idempotent replay (DEPLOYMENT.md double-run check)") {
    val path = tmpDir()
    val b = batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09"))
    Sinks.insertIgnore(spark, b, path, Seq("violation_id"), tiebreak = Some("seq"))
    Sinks.insertIgnore(spark, b, path, Seq("violation_id"), tiebreak = Some("seq"))
    assert(read(path).count() == 2)
  }

  test("big-batch path (dedup pre-check forced): all core laws hold") {
    // the size-gated keys-only pre-check lets a provably-clean bulk load
    // skip the full-width dedup window (the 50M-row index build that
    // blew local disk); force it onto the row-scale fixtures so both
    // branches carry the same semantics
    val prop = "graft.dedup.precheck.min.bytes"
    sys.props(prop) = "0"
    try {
      val p1 = tmpDir()
      // clean batches: check runs, window skipped — rows identical
      Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
        p1, Seq("violation_id"), tiebreak = Some("seq"))
      Sinks.upsert(spark, batch(("b", 20.0, 1, "2024-09"), ("c", 3.0, 1, "2024-10")),
        p1, Seq("violation_id"), tiebreak = Some("seq"))
      assert(asMap(p1) == Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0))
      // dirty batch: check detects, window dedups by tiebreak
      val p2 = tmpDir()
      Sinks.upsert(spark,
        batch(("a", 1.0, 0, "2024-09"), ("a", 9.0, 1, "2024-09")),
        p2, Seq("violation_id"), tiebreak = Some("seq"))
      assert(asMap(p2) == Map("a" -> 9.0))
      // insert-ignore, both shapes
      val p3 = tmpDir()
      Sinks.insertIgnore(spark,
        batch(("a", 1.0, 0, "2024-09"), ("a", 9.0, 1, "2024-09"), ("b", 2.0, 0, "2024-09")),
        p3, Seq("violation_id"), tiebreak = Some("seq"))
      Sinks.insertIgnore(spark, batch(("b", 99.0, 1, "2024-09"), ("c", 3.0, 1, "2024-10")),
        p3, Seq("violation_id"), tiebreak = Some("seq"))
      assert(asMap(p3) == Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
      // partition-scoped merge with a clean batch
      val p4 = tmpDir()
      Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("c", 3.0, 0, "2024-10")),
        p4, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
      Sinks.upsert(spark, batch(("a", 5.0, 1, "2024-09")),
        p4, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
      assert(asMap(p4) == Map("a" -> 5.0, "c" -> 3.0))
    } finally sys.props.remove(prop)
  }

  test("partitioned upsert keeps the month lake layout") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-10")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("month=2024-09", "month=2024-10"))
    // partition column survives the round trip
    assert(read(path).select("month").distinct().count() == 2)
  }

  test("month-partitioned lake prunes partitions on month predicates") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-10"), ("c", 3.0, 0, "2024-11")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    val pruned = read(path).filter(col("month") === "2024-10")
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan must carry the month predicate as a partition filter and
    // read a single partition's files
    assert(plan.contains("PartitionFilters") && plan.contains("month"),
      s"expected partition filter in:\n$plan")
    assert(pruned.queryExecution.executedPlan.collectLeaves().toString
      .contains("month=2024-10") || pruned.count() == 1)
    assert(pruned.count() == 1)
  }

  private def partFiles(path: String, part: String): Map[String, Long] = {
    val d = new java.io.File(path, part)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("partition-scoped upsert leaves untouched months' files unmodified") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-10"), ("c", 3.0, 0, "2024-11")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    val sept = partFiles(path, "month=2024-09")
    val nov = partFiles(path, "month=2024-11")
    assert(sept.nonEmpty && nov.nonEmpty)
    // second upsert touches only 2024-10
    Sinks.upsert(spark, batch(("b", 20.0, 1, "2024-10"), ("d", 4.0, 1, "2024-10")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    assert(partFiles(path, "month=2024-09") == sept) // same files, same mtimes
    assert(partFiles(path, "month=2024-11") == nov)
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0, "d" -> 4.0))
  }

  test("insert-ignore appends: existing files are never rewritten") {
    val path = tmpDir()
    Sinks.insertIgnore(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val before = partFiles(path, ".")
    Sinks.insertIgnore(spark, batch(("a", 9.0, 1, "2024-09"), ("b", 2.0, 1, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val after = partFiles(path, ".")
    assert(before.forall { case (n, m) => after.get(n).contains(m) })
    assert(after.size > before.size) // new file(s) appended
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 2.0))
  }

  test("partition-scoped upsert creates brand-new partitions") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    Sinks.upsert(spark, batch(("z", 9.0, 1, "2024-12")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    assert(asMap(path) == Map("a" -> 1.0, "z" -> 9.0))
    assert(new java.io.File(path, "month=2024-12").exists())
  }

  test("partition-scoped upsert handles null partition values") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    val nullBatch = Seq(("n", 5.0, 1, null.asInstanceOf[String]))
      .toDF("violation_id", "fine_amount", "seq", "month")
    Sinks.upsert(spark, nullBatch, path, Seq("violation_id"),
      partitionBy = Seq("month"), tiebreak = Some("seq"))
    val rows = read(path).collect()
      .map(r => r.getAs[String]("violation_id") -> r.getAs[String]("month")).toMap
    assert(rows == Map("a" -> "2024-09", "n" -> null))
  }

  test("global-key upsert: a key that moves partitions ends with one copy") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09"), ("c", 3.0, 0, "2024-10")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    // "b" corrected into 2024-10: without globalKeys the 2024-09 copy
    // would survive (partition-scoped merge never reads 2024-09)
    Sinks.upsert(spark, batch(("b", 20.0, 1, "2024-10")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"),
      globalKeys = true)
    val rows = read(path).collect()
      .map(r => (r.getAs[String]("violation_id"),
        r.getAs[Double]("fine_amount"), r.getAs[String]("month")))
    assert(rows.count(_._1 == "b") == 1)
    assert(rows.toSet == Set(("a", 1.0, "2024-09"), ("b", 20.0, "2024-10"), ("c", 3.0, "2024-10")))
  }

  test("global-key upsert: a partition emptied by the move is deleted") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("solo", 1.0, 0, "2024-08"), ("x", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    Sinks.upsert(spark, batch(("solo", 9.0, 1, "2024-09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"),
      globalKeys = true)
    assert(read(path).collect().map(r =>
      (r.getAs[String]("violation_id"), r.getAs[String]("month"))).toSet
      == Set(("solo", "2024-09"), ("x", "2024-09")))
    // the emptied 2024-08 directory is gone, not a zombie partition
    assert(!new java.io.File(path, "month=2024-08").exists())
  }

  private def batch2(rows: (String, Double, Int, String, String)*): DataFrame =
    rows.toDF("violation_id", "fine_amount", "seq", "year", "month")

  test("multi-column partition upsert merges only the touched leaf partitions") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch2(("a", 1.0, 0, "2024", "09"), ("b", 2.0, 0, "2024", "10"),
        ("c", 3.0, 0, "2025", "01")),
      path, Seq("violation_id"), partitionBy = Seq("year", "month"),
      tiebreak = Some("seq"))
    val untouched = new java.io.File(path, "year=2025/month=01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    // update one key in 2024/10 and create a brand-new 2025/02 leaf
    Sinks.upsert(spark,
      batch2(("b", 20.0, 1, "2024", "10"), ("z", 9.0, 1, "2025", "02")),
      path, Seq("violation_id"), partitionBy = Seq("year", "month"),
      tiebreak = Some("seq"))
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 20.0, "c" -> 3.0, "z" -> 9.0))
    assert(new java.io.File(path, "year=2025/month=02").isDirectory,
      s"leaves: ${new java.io.File(path, "year=2025").list().mkString(",")}")
    // the untouched leaf's files were not rewritten
    val after = new java.io.File(path, "year=2025/month=01")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(after == untouched)
  }

  test("multi-column global-key upsert deletes an emptied leaf partition") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch2(("solo", 1.0, 0, "2024", "08"), ("x", 2.0, 0, "2024", "09")),
      path, Seq("violation_id"), partitionBy = Seq("year", "month"),
      tiebreak = Some("seq"))
    Sinks.upsert(spark, batch2(("solo", 9.0, 1, "2024", "09")),
      path, Seq("violation_id"), partitionBy = Seq("year", "month"),
      tiebreak = Some("seq"), globalKeys = true)
    // consumer-side read: numeric-looking partition values infer as ints
    assert(read(path).collect().map(r =>
      (r.getAs[String]("violation_id"), r.getAs[Int]("year"),
        r.getAs[Int]("month"))).toSet
      == Set(("solo", 2024, 9), ("x", 2024, 9)))
    assert(!new java.io.File(path, "year=2024/month=08").exists())
  }

  test("numeric-looking string partition values never fork their directory") {
    // "09" must round-trip as the month=09 directory across merges — if
    // the sink's internal read inferred it as int 9, the second upsert
    // would write month=9 BESIDE the stale month=09 (a silent partition
    // fork; both dirs would read back as month 9)
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    Sinks.upsert(spark, batch(("a", 2.0, 1, "09"), ("b", 3.0, 1, "09")),
      path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("month=09"), s"partition forked: $dirs")
    assert(asMap(path) == Map("a" -> 2.0, "b" -> 3.0))
  }

  test("numeric-looking partition strings survive the dirty first-write rewrite") {
    // write-then-verify's DIRTY branch reads the written tmp back and
    // rewrites it partitioned: if that read inferred month "09" as int 9
    // the rewrite would land under month=9 — a renamed partition on the
    // very first load. The tmp read runs with inference off (readRaw);
    // pin the round trip through the forced big-batch path.
    val prop = "graft.dedup.precheck.min.bytes"
    sys.props(prop) = "0"
    try {
      val path = tmpDir()
      Sinks.upsert(spark,
        batch(("a", 1.0, 0, "09"), ("a", 9.0, 1, "09"), ("b", 2.0, 0, "10")),
        path, Seq("violation_id"), partitionBy = Seq("month"), tiebreak = Some("seq"))
      val dirs = new java.io.File(path).listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs == Set("month=09", "month=10"), s"partition renamed: $dirs")
      assert(asMap(path) == Map("a" -> 9.0, "b" -> 2.0))
    } finally sys.props.remove(prop)
  }

  test("whole-table upsert refuses an O(history) rewrite past the size ceiling") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    // an existing lake larger than the ceiling must fail fast, not rewrite
    val e = intercept[IllegalStateException] {
      Sinks.upsert(spark, batch(("c", 3.0, 1, "2024-10")),
        path, Seq("violation_id"), tiebreak = Some("seq"),
        maxFullRewriteBytes = 1L)
    }
    assert(e.getMessage.contains("partitionBy"))
    // nothing was changed by the refused write
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 2.0))
    // raising the ceiling (explicit opt-in) performs the rewrite
    Sinks.upsert(spark, batch(("c", 3.0, 1, "2024-10")),
      path, Seq("violation_id"), tiebreak = Some("seq"),
      maxFullRewriteBytes = Long.MaxValue)
    assert(asMap(path) == Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0))
  }

  test("compaction merges small appended files; untouched dirs keep theirs") {
    val path = tmpDir()
    // 6 daily appends -> >= 6 files in month=2024-09; one append in 2024-10
    (0 until 6).foreach(i =>
      Sinks.insertIgnore(spark, batch((s"k$i", i.toDouble, i, "2024-09")),
        path, Seq("violation_id"), partitionBy = Seq("month")))
    Sinks.insertIgnore(spark, batch(("z", 9.0, 9, "2024-10")),
      path, Seq("violation_id"), partitionBy = Seq("month"))
    val before = asMap(path)
    assert(partFiles(path, "month=2024-09").size >= 6)
    val octBefore = partFiles(path, "month=2024-10")

    Sinks.compact(spark, path, partitioned = true, maxFiles = 4)
    assert(partFiles(path, "month=2024-09").size == 1)
    assert(partFiles(path, "month=2024-10") == octBefore) // below threshold
    assert(asMap(path) == before) // identical content
    // partition column still resolves after compaction
    assert(read(path).filter(col("month") === "2024-09").count() == 6)
    // no stray tmp/aside dirs left behind inside or next to the table
    val strays = new java.io.File(path).getParentFile.listFiles()
      .map(_.getName).filter(n => n.contains("._compact_") || n.contains("._old_"))
    assert(strays.isEmpty)
  }

  test("compaction on an unpartitioned table") {
    val path = tmpDir()
    (0 until 6).foreach(i =>
      Sinks.insertIgnore(spark, batch((s"k$i", i.toDouble, i, "2024-09")),
        path, Seq("violation_id")))
    val before = asMap(path)
    assert(partFiles(path, ".").size >= 6)
    Sinks.compact(spark, path, partitioned = false, maxFiles = 4)
    assert(partFiles(path, ".").size == 1)
    assert(asMap(path) == before)
  }

  test("upsert schema evolution: batches may add or omit columns") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    // later batch adds a column: existing rows null-fill it
    Sinks.upsert(spark,
      Seq(("c", 3.0, 1, "2024-09", "note-c"))
        .toDF("violation_id", "fine_amount", "seq", "month", "note"),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val withNote = read(path).collect()
      .map(r => r.getAs[String]("violation_id") -> r.getAs[String]("note")).toMap
    assert(withNote == Map("a" -> null, "b" -> null, "c" -> "note-c"))
    // later batch OMITS the column: the upserted row carries exactly what
    // the batch declared (every batch column updated, rest null)
    Sinks.upsert(spark, batch(("c", 30.0, 2, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val after = read(path).collect()
      .map(r => r.getAs[String]("violation_id") ->
        (r.getAs[Double]("fine_amount"), r.getAs[String]("note"))).toMap
    assert(after("c") == (30.0, null))
    assert(after.keySet == Set("a", "b", "c"))
  }

  test("insert-ignore schema evolution: appended files with a new column merge on read") {
    val path = tmpDir()
    Sinks.insertIgnore(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    Sinks.insertIgnore(spark,
      Seq(("b", 2.0, 1, "2024-09", "note-b"))
        .toDF("violation_id", "fine_amount", "seq", "month", "note"),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val got = spark.read.option("mergeSchema", "true").parquet(path).collect()
      .map(r => r.getAs[String]("violation_id") -> r.getAs[String]("note")).toMap
    assert(got == Map("a" -> null, "b" -> "note-b"))
  }

  test("sortBy layout: every written file is internally sorted (skippable row groups)") {
    val path = tmpDir()
    val rows = (0 until 200).map(i =>
      (f"id_${(i * 37) % 200}%04d", i.toDouble, i, "2024-09")) // scrambled ids
    Sinks.upsert(spark, rows.toDF("violation_id", "fine_amount", "seq", "month"),
      path, Seq("violation_id"), tiebreak = Some("seq"),
      sortBy = Seq("violation_id"))
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .collect().map(_.getAs[String]("violation_id")).toSeq
      assert(ids == ids.sorted, s"${f.getName} not sorted")
    }
  }

  test("maxRecordsPerFile caps output file size; content unchanged") {
    val path = tmpDir()
    val rows = (0 until 200).map(i => (f"id_$i%04d", i.toDouble, i, "2024-09"))
    Sinks.upsert(spark, rows.toDF("violation_id", "fine_amount", "seq", "month")
        .coalesce(1), // one task would otherwise emit one 200-row file
      path, Seq("violation_id"), tiebreak = Some("seq"),
      maxRecordsPerFile = 50L)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length >= 4)
    assert(read(path).count() == 200)
  }

  test("S9 DDL-on-write: ensure-table DDL, then sink writes read back via the catalog") {
    // the reference issues CREATE TABLE IF NOT EXISTS before every load
    // (ref: etl/full_load/violation_etl_history.py:44-64); here the same
    // ensure-then-write shape runs through the session catalog: DDL with
    // MySQL-ish types (VARCHAR widths; the PRIMARY KEY contract is what
    // Sinks.upsert's keep-last merge enforces), idempotent re-run, sink
    // writes landing at the table location, reads via spark.table
    val loc = tmpDir()
    val ddl =
      s"""CREATE TABLE IF NOT EXISTS violations_s9 (
         |  violation_id VARCHAR(50),
         |  fine_amount  DOUBLE,
         |  seq          INT,
         |  month        VARCHAR(7)
         |) USING parquet LOCATION '$loc'""".stripMargin
    spark.sql(ddl)
    spark.sql(ddl) // IF NOT EXISTS: second ensure is a no-op, like the reference
    try {
      Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09"), ("b", 2.0, 0, "2024-09")),
        loc, Seq("violation_id"), tiebreak = Some("seq"))
      spark.catalog.refreshTable("violations_s9")
      assert(spark.table("violations_s9").count() == 2)
      Sinks.upsert(spark, batch(("b", 20.0, 1, "2024-09")),
        loc, Seq("violation_id"), tiebreak = Some("seq"))
      spark.catalog.refreshTable("violations_s9")
      val m = spark.table("violations_s9").collect()
        .map(r => r.getAs[String]("violation_id") -> r.getAs[Double]("fine_amount"))
        .toMap
      assert(m == Map("a" -> 1.0, "b" -> 20.0))
    } finally spark.sql("DROP TABLE IF EXISTS violations_s9")
  }

  test("sweepLeftovers removes only STALE scratch dirs beside the table") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val parent = new java.io.File(path).getParentFile
    val name = new java.io.File(path).getName
    // simulate an interrupted write (old) and a live one (fresh)
    val stale = new java.io.File(parent, name + "._tmp_deadbeef")
    val fresh = new java.io.File(parent, name + "._aside_cafe1234")
    val unrelated = new java.io.File(parent, "other_table._tmp_ffff")
    Seq(stale, fresh, unrelated).foreach(d => assert(d.mkdirs()))
    assert(stale.setLastModified(System.currentTimeMillis() - 2L * 3600 * 1000))
    val deleted = Sinks.sweepLeftovers(spark, path)
    assert(deleted.exists(_.endsWith("._tmp_deadbeef")) && deleted.size == 1,
      s"deleted: $deleted")
    assert(!stale.exists(), "stale tmp not removed")
    assert(fresh.exists(), "fresh scratch must survive (could be a live write)")
    assert(unrelated.exists(), "another table's scratch must survive")
    // the table itself is untouched
    assert(asMap(path) == Map("a" -> 1.0))
    fresh.delete(); unrelated.delete()
  }

  test("upsert and insert-ignore preserve full row content") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 5, "2024-09")), path,
      Seq("violation_id"), tiebreak = Some("seq"))
    val r = read(path).collect()(0)
    assert(r.getAs[Int]("seq") == 5 && r.getAs[String]("month") == "2024-09")
  }
}
