package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line.
  *
  * A small warmup (range + parquet footer read + one tiny query) runs
  * before timing so JVM/session/codegen startup doesn't land on whichever
  * query happens to run first; queries then run in name order.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JVM + codegen + parquet reader paths
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.nation(spark, sfDir).count()
    SparkEntry.queries.get("qd_join_filter_count")
      .foreach(q => q(spark, sfDir).count())

    // A failing query must read as a failure, not as a fast success:
    // its time is reported as -1 and it is excluded from the total.
    // Cached intermediates (sketch/similarity persists) are cleared after
    // each query so cache occupancy doesn't grow across the run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val elapsed = (System.nanoTime() - t0) / 1e9 // before cache teardown
      spark.catalog.clearCache()
      name -> (if (ok) elapsed else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
