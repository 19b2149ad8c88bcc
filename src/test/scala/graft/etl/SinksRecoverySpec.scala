package graft.etl

import java.nio.file.Files

import graft.SparkSpec

/** sweepLeftovers' crash-recovery guard (ADVICE r14 medium): a crash
  * BETWEEN swapDirs' rename-aside and rename-in leaves the table (or one
  * partition dir) absent, with the old copy living only in the aside and
  * the replacement only in a tmp. A cron'd sweep landing in that window
  * must NOT delete the surviving copies — it skips them with a warning
  * until an operator renames one back in (or passes force = true).
  */
class SinksRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sweep").resolve("t").toString

  private def batch(rows: (String, Double, Int, String)*) =
    rows.toDF("violation_id", "fine_amount", "seq", "month")

  /** Age every file and dir in `d` past the sweep's 1 h staleness cutoff
    * (newestMtime takes the max over the whole tree).
    */
  private def ageTree(d: java.io.File): Unit = {
    val old = System.currentTimeMillis() - 2L * 3600 * 1000
    def walk(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(walk))
      f.setLastModified(old); ()
    }
    walk(d)
  }

  private def putData(d: java.io.File): Unit = {
    assert(d.isDirectory || d.mkdirs())
    Files.write(d.toPath.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    ()
  }

  test("crashed whole-table swap: sweep preserves both copies until recovery") {
    val path = tmpDir()
    Sinks.upsert(spark, batch(("a", 1.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"))
    val table = new java.io.File(path)
    val parent = table.getParentFile
    // crash window: table renamed aside, replacement still in tmp
    val aside = new java.io.File(parent, table.getName + "._old_crash01")
    val tmp = new java.io.File(parent, table.getName + "._tmp_crash01")
    assert(table.renameTo(aside))
    putData(tmp)
    ageTree(parent)

    val deleted = Sinks.sweepLeftovers(spark, path)
    assert(deleted.isEmpty, s"sweep deleted recovery copies: $deleted")
    assert(aside.exists() && tmp.exists())

    // operator recovers the OLD copy; the next sweep clears the rest
    assert(aside.renameTo(table))
    ageTree(parent)
    val deleted2 = Sinks.sweepLeftovers(spark, path)
    assert(deleted2.exists(_.endsWith("._tmp_crash01")) && deleted2.size == 1)
    assert(spark.read.parquet(path).count() == 1, "recovered table unreadable")
  }

  test("crashed partition swap: aside with a missing partition dir survives") {
    val path = tmpDir()
    Sinks.upsert(spark,
      batch(("a", 1.0, 0, "2024-08"), ("b", 2.0, 0, "2024-09")),
      path, Seq("violation_id"), tiebreak = Some("seq"),
      partitionBy = Seq("month"))
    val table = new java.io.File(path)
    val parent = table.getParentFile
    // crash window on month=2024-09: partition dir moved into the aside,
    // merged replacement still in the tmp
    val asideRoot = new java.io.File(parent, table.getName + "._aside_crash02")
    assert(asideRoot.mkdirs())
    val part = new java.io.File(table, "month=2024-09")
    val asideChild = new java.io.File(asideRoot, "month=2024-09._old_crash02")
    assert(part.renameTo(asideChild))
    val tmp = new java.io.File(parent, table.getName + "._tmp_crash02")
    putData(new java.io.File(tmp, "month=2024-09"))
    ageTree(parent)

    val deleted = Sinks.sweepLeftovers(spark, path)
    // the table root is alive (month=2024-08), so the redundant tmp goes;
    // the aside is the ONLY copy of month=2024-09 and must survive
    assert(deleted.exists(_.endsWith("._tmp_crash02")) && deleted.size == 1,
      s"deleted: $deleted")
    assert(asideChild.exists(), "only copy of the partition was swept")

    // once the partition is alive again the aside is redundant and sweeps
    assert(asideChild.renameTo(part))
    putData(asideChild) // stale duplicate left behind, now safe to sweep
    ageTree(parent)
    val deleted2 = Sinks.sweepLeftovers(spark, path)
    assert(deleted2.exists(_.endsWith("._aside_crash02")) && deleted2.size == 1)
    assert(spark.read.parquet(path).count() == 2)
  }

  test("nested-partition asides decode %2F to locate the exact target dir") {
    val path = tmpDir()
    val table = new java.io.File(path)
    putData(new java.io.File(table, "year=2020/month=09"))
    val parent = table.getParentFile
    val asideRoot = new java.io.File(parent, table.getName + "._aside_crash03")
    putData(new java.io.File(asideRoot, "year=2020%2Fmonth=09._old_crash03"))
    ageTree(parent)
    // target alive -> the aside is a redundant copy, swept
    assert(Sinks.sweepLeftovers(spark, path).size == 1)

    putData(new java.io.File(asideRoot, "year=2020%2Fmonth=09._old_crash03"))
    assert(new java.io.File(table, "year=2020/month=09/part-00000.parquet").delete())
    ageTree(parent)
    // target dir empty -> the aside may be the only copy, skipped
    assert(Sinks.sweepLeftovers(spark, path).isEmpty)
    assert(asideRoot.exists())

    // force abandons the data deliberately
    assert(Sinks.sweepLeftovers(spark, path, force = true).size == 1)
    assert(!asideRoot.exists())
  }

  test("partition values spelling %2F or ._old_ cannot confuse the aside guard") {
    // Hive's own path escaping writes a literal '/' inside a partition
    // VALUE as %2F (value "2024/09" -> dir "month=2024%2F09"), and '.'
    // and '_' are not escaped at all — so the aside naming escapes '%'
    // first (rel -> "month=2024%252F09") and the target split takes the
    // LAST "._old_", or the guard would test the wrong directory.
    val path = tmpDir()
    val table = new java.io.File(path)
    putData(new java.io.File(table, "month=2024%2F09"))
    val parent = table.getParentFile
    val asideRoot = new java.io.File(parent, table.getName + "._aside_crash04")
    putData(new java.io.File(asideRoot, "month=2024%252F09._old_crash04"))
    ageTree(parent)
    // target alive -> redundant aside sweeps (decode resolves the VALUE
    // escape back to the real dir name, not to a bogus nested path)
    assert(Sinks.sweepLeftovers(spark, path).size == 1)

    // a value containing the literal "._old_": only the FINAL "._old_"
    // (ours, before the uuid) splits the name. A decoy partition matching
    // the WRONG split must not make the guard approve the sweep.
    putData(new java.io.File(table, "month=x")) // decoy: first-split target
    putData(new java.io.File(asideRoot, "month=x._old_y._old_crash04"))
    ageTree(parent)
    // real target "month=x._old_y" is absent -> aside may be the only
    // copy -> skipped (the pre-fix indexOf split read the alive decoy
    // "month=x" and swept it)
    assert(Sinks.sweepLeftovers(spark, path).isEmpty)
    assert(asideRoot.exists())

    // restore the real target: now the aside is redundant and sweeps
    putData(new java.io.File(table, "month=x._old_y"))
    ageTree(parent)
    assert(Sinks.sweepLeftovers(spark, path).size == 1)
    assert(!asideRoot.exists())
  }
}
