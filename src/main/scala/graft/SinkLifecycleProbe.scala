package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Sinks

/** Composed end-to-end rehearsal of the sink lifecycle at 100× corpus
  * scale (VERDICT r14 item 3): the write-then-verify bulk load,
  * leftover sweeping (including the crash-recovery guard), daily
  * partitioned merges with a global-keys re-ingest, append-only daily
  * ingestion, and compaction — each phase followed by DIRECTORY-SET
  * assertions, so the interaction surface the SinksLawSpec /
  * SinksExecOnceSpec laws cover piecewise is pinned composed.
  *
  *   scripts/run_main.sh graft.SinkLifecycleProbe /tmp/docs100x
  *
  * The corpus is built on demand (ProbeCorpus, 100× sf0.1 documents —
  * ~60 MB parquet / 500k docs). `graft.dedup.precheck.min.bytes` is
  * lowered to 8 MB for the run so this corpus takes the genuine
  * bulk-load branches (write-then-verify, merge persist/replayable-scan
  * gating) that production crosses at 256 MB; the branch selection is
  * asserted indirectly by the phase receipts (a dirty bulk load that
  * skipped write-then-verify would land duplicate keys).
  *
  * Receipt (SURVEY §10.22): every phase's wall time and the directory
  * set after each phase; any leftover or lost copy fails the run.
  */
object SinkLifecycleProbe {

  private def fail(msg: String): Nothing = throw new AssertionError(msg)

  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/docs100x")
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")

    if (!new java.io.File(corpus, "documents.parquet").exists())
      ProbeCorpus.build(spark, "/root/testdata/sf0.1", corpus, copies = 100,
        onlyTables = Some(Set("documents")))
    ProbeCorpus.assertScanParallel(corpus)

    sys.props("graft.dedup.precheck.min.bytes") = (8L << 20).toString
    val work = java.nio.file.Files.createTempDirectory("sink-lifecycle")
    val parentDir = new java.io.File(work.toFile, "lake")
    parentDir.mkdirs()
    val fs = new Path(parentDir.toString)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def dirSet(): Set[String] =
      Option(parentDir.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    def assertDirs(expect: Set[String], phase: String): Unit =
      if (dirSet() != expect)
        fail(s"[$phase] dir set ${dirSet()} != expected $expect")
    def parquetFiles(d: java.io.File): Int =
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lifecycle] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def ageTree(d: java.io.File): Unit = {
      val old = System.currentTimeMillis() - 2L * 3600 * 1000
      def walk(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(walk))
        f.setLastModified(old); ()
      }
      walk(d)
    }

    val docs = Tables.documents(spark, corpus)
    val nDocs = docs.count()
    println(s"[lifecycle] corpus: $nDocs docs")

    // ---- Phase 1: DIRTY bulk first load (forces write-then-verify's
    // rewrite branch: ~1% of ids arrive twice with different payloads)
    val dirty = docs.unionByName(
      docs.filter(col("doc_id") % 97 === 0).withColumn("n_chars", lit(-1L)))
    val t1 = parentDir.toString + "/docs_bulk"
    time("bulk first load (dirty)") {
      Sinks.upsert(spark, dirty, t1, keys = Seq("doc_id"),
        tiebreak = Some("n_chars"), sortBy = Seq("doc_id"))
    }
    assertDirs(Set("docs_bulk"), "bulk")
    val loaded = spark.read.parquet(t1)
    if (loaded.count() != nDocs) fail(s"bulk: ${loaded.count()} rows != $nDocs")
    val dupKeys = loaded.groupBy("doc_id").count().filter(col("count") > 1).count()
    if (dupKeys != 0) fail(s"bulk: $dupKeys duplicate keys after write-verify")

    // ---- Phase 2: interrupted writes — one stale orphan tmp (sweepable),
    // one fresh tmp (a live write the sweep must not touch), and a
    // simulated crashed whole-table swap on a second table (the aside and
    // replacement are the only copies — the guard must keep both)
    val staleTmp = new java.io.File(parentDir, "docs_bulk._tmp_orphan01")
    val freshTmp = new java.io.File(parentDir, "docs_bulk._tmp_live0001")
    docs.limit(1000).write.parquet(staleTmp.toString)
    docs.limit(10).write.parquet(freshTmp.toString)
    ageTree(staleTmp)
    val t2 = parentDir.toString + "/docs_crashed"
    docs.limit(5000).write.parquet(t2)
    // crash window: table renamed aside, replacement still in tmp
    val crashedAside = new java.io.File(parentDir, "docs_crashed._old_crash001")
    val crashedTmp = new java.io.File(parentDir, "docs_crashed._tmp_crash001")
    if (!new java.io.File(t2).renameTo(crashedAside)) fail("rename-aside failed")
    docs.limit(5000).write.parquet(crashedTmp.toString)
    ageTree(crashedAside); ageTree(crashedTmp)

    // ---- Phase 3: sweep — exactly the orphan goes; the live write and
    // both crash-recovery copies survive
    val swept = time("sweepLeftovers") {
      Sinks.sweepLeftovers(spark, t1) ++ Sinks.sweepLeftovers(spark, t2)
    }
    if (swept.size != 1 || !swept.head.endsWith("._tmp_orphan01"))
      fail(s"sweep deleted $swept, expected only the stale orphan")
    assertDirs(Set("docs_bulk", "docs_bulk._tmp_live0001",
      "docs_crashed._old_crash001", "docs_crashed._tmp_crash001"), "sweep")
    // operator recovery: old copy back in; the next sweep clears the tmp
    if (!crashedAside.renameTo(new java.io.File(t2))) fail("recovery failed")
    ageTree(crashedTmp)
    val swept2 = Sinks.sweepLeftovers(spark, t2, force = false)
    if (swept2.size != 1) fail(s"post-recovery sweep: $swept2")
    fs.delete(new Path(freshTmp.toString), true)
    fs.delete(new Path(t2), true)
    assertDirs(Set("docs_bulk"), "recovery")

    // ---- Phase 4: daily partitioned merges (upsert, globalKeys) — seven
    // daily batches into an ingest_date-partitioned index, then a
    // re-ingest of day 1's docs under day 8 (the global-keys partition
    // move: day-1 copies must vanish, the one-row-per-key invariant hold)
    val t3 = parentDir.toString + "/docs_daily"
    val day = (d: Int) => docs.filter(col("doc_id") % 7 === d)
      .withColumn("ingest_date", lit(f"2024-09-0${d + 1}%d"))
    time("7 daily partitioned merges") {
      (0 until 7).foreach(d => Sinks.upsert(spark, day(d), t3,
        keys = Seq("doc_id"), partitionBy = Seq("ingest_date"),
        globalKeys = true))
    }
    val reingest = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("ingest_date", lit("2024-09-08"))
    time("global-keys re-ingest (partition move)") {
      Sinks.upsert(spark, reingest, t3, keys = Seq("doc_id"),
        partitionBy = Seq("ingest_date"), globalKeys = true)
    }
    val daily = spark.read.parquet(t3)
    if (daily.count() != nDocs) fail(s"daily: ${daily.count()} != $nDocs")
    if (daily.select("doc_id").distinct().count() != nDocs)
      fail("daily: duplicate keys after partition move")
    val day1 = new java.io.File(t3, "ingest_date=2024-09-01")
    if (day1.exists()) fail("daily: moved-out partition dir not deleted")
    assertDirs(Set("docs_bulk", "docs_daily"), "daily")

    // ---- Phase 5: append-only ingestion + compaction — eight
    // insert-ignore appends into ONE partition pile up small files;
    // compact rewrites the pile crash-safely and leaves no scratch
    val t4 = parentDir.toString + "/docs_append"
    time("8 insert-ignore appends") {
      (0 until 8).foreach { d =>
        Sinks.insertIgnore(spark,
          docs.filter(col("doc_id") % 8 === d)
            .withColumn("month", lit("2024-09")).coalesce(1),
          t4, keys = Seq("doc_id"), partitionBy = Seq("month"))
      }
    }
    val monthDir = new java.io.File(t4, "month=2024-09")
    val filesBefore = parquetFiles(monthDir)
    if (filesBefore < 8) fail(s"append: only $filesBefore files, expected >=8")
    time("compact") {
      Sinks.compact(spark, t4, partitioned = true, maxFiles = 4, targetFiles = 1)
    }
    if (parquetFiles(monthDir) != 1)
      fail(s"compact: ${parquetFiles(monthDir)} files, expected 1")
    if (spark.read.parquet(t4).count() != nDocs)
      fail("compact changed row count")
    assertDirs(Set("docs_bulk", "docs_daily", "docs_append"), "compact")

    println("[lifecycle] PASS — all phases, no leftovers, no lost copies")
    spark.stop()
  }
}
