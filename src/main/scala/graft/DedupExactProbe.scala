package graft

import org.apache.spark.sql.functions._

/** A/B of the composed pipeline's exact-dedup stage shapes at a probe
  * tier: row_number window (full-row shuffle + per-partition sort, no
  * map-side combine) vs min_by groupBy (partial-aggregating, but a
  * struct buffer drops the aggregate out of the codegen'd hash path)
  * vs a narrow min(id) groupBy + self-join. Interleaved, min-of-N.
  *
  *   scripts/run_main.sh graft.DedupExactProbe /tmp/docs1000x
  */
object DedupExactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs1000x")
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm

    def fold(df: org.apache.spark.sql.DataFrame): Long = {
      val safe = df.toDF(df.columns.indices.map("c" + _): _*)
      safe.select(xxhash64(struct(safe.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)
    }
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dx] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($r)")
    }
    val cols = docs.columns

    def window = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      docs.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
    def minBy = docs
      .groupBy(md5(col("text")).as("_h"))
      .agg(min_by(struct(cols.map(col): _*), col("doc_id")).as("_r"))
      .select(cols.map(c => col("_r").getField(c).as(c)): _*)

    (1 to 4).foreach { i =>
      time(s"window[$i]")(fold(window))
      time(s"min_by[$i]")(fold(minBy))
    }
    spark.stop()
  }
}
