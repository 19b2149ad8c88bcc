package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 adversarial-skew rehearsal.
  *
  *   sbt "runMain graft.SkewProbe /tmp/docs100x [hotShare]"
  *
  * The 100 TB failure mode the batch probes never exercised: one join key
  * carrying a disproportionate share of the fact side. The probe rewrites
  * the 10M-row events table so ONE user owns `hotShare` (default 0.5) of
  * all rows, joins it to the 1500-row per-user dim, and measures the four
  * strategies side by side:
  *
  *   smj_noaqe    sort-merge join, AQE off, broadcast off — the naive
  *                plan; the hot key is ONE sort-merge partition, so wall
  *                time is that single task (the anti-pattern receipt)
  *   smj_aqe      AQE skew-join on — the runtime fix: the planner splits
  *                the oversized partition into subpartitions and
  *                replicates the matching dim rows
  *   salted       graft.ops.SkewJoin.saltedInnerJoin — the explicit,
  *                optimizer-independent form (8 salts)
  *   broadcast    what a 1500-row dim should get anyway: no fact shuffle
  *                at all — skew cannot exist without a shuffle
  *
  * Each variant computes the same aggregate (rows + a value checksum per
  * nation-of-user) so outputs are compared for equality, and per-join-task
  * row imbalance is reported for the receipt (max/mean task input rows).
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs100x")
    val hotShare = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")

    // --- the adversarial fact: reassign hotShare of events to user 0 ---
    val ev = Tables.events(spark, dir)
      .withColumn("user_id",
        when(pmod(hash(col("event_id")), lit(1000)) < lit((hotShare * 1000).toInt),
          lit(0L)).otherwise(col("user_id")))
      .select("event_id", "user_id", "value")
    // the dim: one row per user (plus the hot user 0)
    val dim = ev.sparkSession.read.parquet(s"$dir/customer.parquet")
      .select(pmod(col("c_custkey"), lit(1500)).as("user_id"),
        col("c_nationkey").as("nation"))
      .groupBy("user_id").agg(min("nation").as("nation"))

    val skewPath = "/tmp/skew_probe/events"
    val dimPath = "/tmp/skew_probe/dim"
    // 32-way layout so scan tasks are small and the join stage's own
    // imbalance is what the max-task receipt shows
    ev.repartition(32).write.mode("overwrite").parquet(skewPath)
    dim.write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.parquet(skewPath)
    val dimT = spark.read.parquet(dimPath)
    val total = fact.count()
    val hotRows = fact.filter(col("user_id") === 0L).count()
    println(f"fact $total%d rows, hot key share ${hotRows.toDouble / total}%.3f")

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("nation")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,3)")).as("v"))

    // the receipt that wall time alone hides on an overlapped local run:
    // the LONGEST single task. On a 1000-executor cluster the straggler
    // IS the stage time — a hot key pinned to one task means the whole
    // stage waits on it however many executors are idle.
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          maxTaskMs.getAndAccumulate(
            Option(t.taskInfo).map(_.duration).getOrElse(0L), math.max)
      })

    def time(label: String, confs: Map[String, String])(f: => DataFrame): Array[org.apache.spark.sql.Row] = {
      val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        maxTaskMs.set(0)
        val t0 = System.nanoTime()
        val out = f.orderBy("nation").collect()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // let the listener bus drain task-end events
        println(f"$label%-10s $sec%7.1f s  max task ${maxTaskMs.get / 1000.0}%6.1f s  (${out.length} groups)")
        out
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val noBroadcast = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    val aqeOff = time("smj_noaqe",
      noBroadcast + ("spark.sql.adaptive.enabled" -> "false")) {
      agg(fact.join(dimT, "user_id"))
    }
    val aqeOn = time("smj_aqe",
      noBroadcast ++ Map(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB")) {
      agg(fact.join(dimT, "user_id"))
    }
    val salted = time("salted", noBroadcast) {
      agg(ops.SkewJoin.saltedInnerJoin(fact, dimT, "user_id", "event_id"))
    }
    val bcast = time("broadcast", Map.empty) {
      agg(fact.join(broadcast(dimT), "user_id"))
    }

    require(aqeOff.sameElements(aqeOn) && aqeOn.sameElements(salted)
        && salted.sameElements(bcast),
      "strategy outputs diverge")
    println("all four strategies agree on the aggregate")
    spark.stop()
  }
}
