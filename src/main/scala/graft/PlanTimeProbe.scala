package graft

import org.apache.spark.sql.functions._

/** Is the composed chain's cost DATA or PLANNING? Splits a late prefix's
  * wall time into analysis+optimization (optimizedPlan), physical
  * planning (executedPlan, pre-AQE), and execution (fold). Multi-
  * reference stages duplicate their upstream subtree in the logical
  * plan, so tree size can compound down the chain and planning can go
  * super-linear while the data (a few thousand rows) stays trivial.
  *
  *   scripts/run_main.sh graft.PlanTimeProbe /tmp/docs1000x
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs1000x")
    val baseDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    val benchmark = Tables.documents(spark, baseDir)
      .filter(col("doc_id") % 97 === 0)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[plan] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val p7 = time("construct(s1..s7)") {
      pipeline.CorpusPipeline(docs)
        .dedupExact()
        .removeRepeatedSpans()
        .dedupNearSimhash()
        .decontaminate(benchmark)
        .redactPii()
        .filterRepetition()
        .filterBoilerplate()
        .filterQualityEnsemble()
    }
    val out = p7.df
    time("logical_nodes") {
      println(s"[plan]   logical tree size = ${out.queryExecution.logical.collect { case n => n }.size}")
    }
    time("optimize") { out.queryExecution.optimizedPlan }
    time("optimized_nodes") {
      println(s"[plan]   optimized tree size = ${out.queryExecution.optimizedPlan.collect { case n => n }.size}")
    }
    time("physical_plan") { out.queryExecution.executedPlan }
    time("execute_fold") {
      val safe = out.toDF(out.columns.indices.map("c" + _): _*)
      safe.select(xxhash64(struct(safe.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
    }
    spark.stop()
  }
}
