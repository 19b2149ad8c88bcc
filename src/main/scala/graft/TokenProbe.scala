package graft

import org.apache.spark.sql.functions._

/** Cost decomposition of the SimHash signature pass — the floor of the
  * dedup-group family at 1000× ("signature-pass-bound", SURVEY §10.17).
  * Times three nested slices of the same scan so the deltas isolate each
  * stage: parquet scan+decode, regex whitespace tokenization, SimHash
  * kernel.
  *
  *   scripts/run_main.sh graft.TokenProbe /tmp/docs100x
  */
object TokenProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs100x")
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir).select(col("text"))
    // warmup scan
    docs.count()
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tok] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($r)")
    }
    time("scan_len")(
      docs.select(sum(length(col("text")))).first().getLong(0))
    time("split_size")(
      docs.select(sum(size(split(trim(col("text")), "\\s+")))).first().getLong(0))
    time("simhash")(
      docs.select(graft.functions.SimHashExpr.of(
          split(trim(col("text")), "\\s+")).as("h"))
        .agg(expr("bit_xor(h)")).first().getLong(0))
    time("simhash_fused")(
      docs.select(graft.functions.SimHashTextExpr.of(col("text")).as("h"))
        .agg(expr("bit_xor(h)")).first().getLong(0))
    // the MinHash signature pass, unfused chain vs fused walk (VERDICT
    // r12 item 4). Fold xxhash64 over the signature array so all K
    // minima materialize per row.
    import graft.queries.SketchDedupQueries.{as, bs, P}
    time("minhash")(
      docs.select(col("text"))
        .select(split(trim(col("text")), "\\s+").as("tk"))
        .filter(size(col("tk")) >= 3)
        .select(graft.functions.MinHashSigExpr.sig(
          graft.functions.ShinglesExpr.shingles(col("tk")), as, bs, P).as("m"))
        .select(xxhash64(col("m")).as("h"))
        .agg(expr("bit_xor(h)")).first().getLong(0))
    time("minhash_fused")(
      docs.select(graft.functions.MinHashTextExpr.sig(col("text"), as, bs, P).as("m"))
        .filter(col("m").isNotNull)
        .select(xxhash64(col("m")).as("h"))
        .agg(expr("bit_xor(h)")).first().getLong(0))
    spark.stop()
  }
}
