package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.{col => fcol, struct => fstruct, xxhash64}

import scala.collection.mutable.ArrayBuffer

/** Counts file-scan stages and bytes during the BUILD phase vs the FOLD
  * phase of one query — pins down whether a persisted intermediate is
  * recomputed from the source (a cache miss the plan audit can't see).
  *
  *   scripts/run_main.sh graft.ScanCountProbe q_langid_nb
  */
object ScanCountProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.localSession(cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val rows = ArrayBuffer.empty[(String, Long, Long)] // (phase, inputBytes, execMs)
    @volatile var phase = "warmup"
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        rows.synchronized {
          rows += ((phase, m.inputMetrics.bytesRead, m.executorRunTime))
        }
      }
    })

    args.foreach { name =>
      CacheScope.drain(spark)
      spark.catalog.clearCache()
      phase = s"$name/build"
      val raw = SparkEntry.queries(name)(spark, sfDir)
      Thread.sleep(500)
      phase = s"$name/fold"
      val df = raw.toDF(raw.columns.indices.map("c" + _): _*)
      df.select(xxhash64(fstruct(df.columns.map(fcol): _*)).as("h"))
        .agg(org.apache.spark.sql.functions.expr("bit_xor(h)")).collect()
      Thread.sleep(500)
      phase = "drain"
      rows.synchronized {
        rows.filter(_._1.startsWith(name)).foreach { case (p, in, ms) =>
          if (in > 1000000 || ms > 1000)
            println(f"[scan] $p%-22s input=${in / 1e6}%8.1fMB exec=${ms / 1e3}%7.2fs")
        }
      }
    }
    spark.stop()
  }
}
