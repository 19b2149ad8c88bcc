package graft

/** Ad-hoc scale probe: runs the dedup pipelines on an enlarged documents
  * table (see scripts in the session) and reports timings + result sizes.
  * Usage: sbt "runMain graft.ScaleProbe /tmp/docs10x"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs10x")
    val spark = Tables.localSession(cores = 32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("dedup_exact")(queries.TextQueries.qDedupExact(spark, dir).count())
    time("dedup_minhash_lsh")(queries.SketchDedupQueries.qDedupMinhashLsh(spark, dir).count())
    time("dedup_simhash")(queries.SketchDedupQueries.qDedupSimhash(spark, dir).count())
    time("text_fingerprint")(queries.TextQueries.qTextFingerprint(spark, dir).count())
    spark.stop()
  }
}
