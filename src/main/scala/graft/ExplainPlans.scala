package graft

/** Prints formatted physical plans for headline queries — the
  * scale-readiness review loop: check filter pushdown into parquet scans
  * (PushedFilters/ReadSchema), broadcast vs shuffle joins, and
  * whole-stage-codegen coverage.
  *
  * Usage: sbt "runMain graft.ExplainPlans [names...]"
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.localSession(cores = 8)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "qd_join_filter_count", "qf_like_sum", "qb_filter_count",
      "qe_sum_by_month", "q_dedup_exact")
    names.foreach { n =>
      println(s"\n===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
