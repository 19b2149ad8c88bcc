package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

/** A/B for the one gap in [[graft.pipeline.CorpusPipeline]]'s
  * conditional-waist argument (round-13 VERDICT item 5): `waist` keys
  * on plan SHAPE (Join/Aggregate/Window/Generate/Deduplicate ⇒
  * persist), so a fan-out stage whose upstream is an EXPENSIVE
  * projection-only chain — heavy native expressions, no shuffle —
  * re-executes that chain once per fan-out reference. Is the re-execute
  * actually cheaper than materialize+re-read, as the waist's scaladoc
  * claims for scan/filter/project inputs, even when the projection is
  * deliberately hot?
  *
  * The probe builds the worst plausible such upstream — MinHash
  * signature + SimHash fingerprint + char-ngram counts over the text,
  * all md5/byte-walk-dominated native expressions — and drives
  * filterBoilerplate (the widest fan-out: its input feeds the hot-set
  * aggregate, the per-doc fraction, the doc count, AND the final
  * anti-join) through it, unwaisted vs explicitly persistStage()d,
  * interleaved min-of-N:
  *
  *   scripts/run_main.sh graft.WaistProbe /tmp/docs100x
  *
  * Outcome (recorded in SURVEY §10.21): whichever way it lands, the
  * receipt replaces the "likely fine" in the waist argument.
  */
object WaistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs100x")
    val spark = Tables.localSession(cores = 32, probeSplits = true)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm

    def fold(df: DataFrame): Long = {
      val safe = df.toDF(df.columns.indices.map("c" + _): _*)
      safe.select(xxhash64(struct(safe.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect().head.getLong(0)
    }
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[waist] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s   ($r)")
    }

    import queries.SketchDedupQueries.{P, as, bs}
    // projection-only but expensive: three fused byte walks per row.
    // No join/agg/window/generate anywhere upstream, so waist() skips
    // the persist and filterBoilerplate's four references re-run it.
    def heavy: DataFrame = docs
      .withColumn("m", functions.MinHashTextExpr.sig(col("text"), as, bs, P))
      .withColumn("simhash", functions.SimHashTextExpr.of(col("text")))
      // size() keeps the full counts walk but yields a hashable long
      .withColumn("ngrams", size(functions.CharNgramCountsExpr.charNgramCounts(col("text"))))
      .filter(col("m").isNotNull)

    def unwaisted: DataFrame =
      CorpusPipeline(heavy).filterBoilerplate(maxFrac = 0.5).df
    def waisted: DataFrame =
      CorpusPipeline(heavy).persistStage().filterBoilerplate(maxFrac = 0.5).df

    // baseline: the heavy projection alone, once
    (1 to 3).foreach { i => time(s"heavy_once[$i]")(fold(heavy)) }
    (1 to 4).foreach { i =>
      time(s"unwaisted[$i]") { val h = fold(unwaisted); CacheScope.drain(spark); h }
      time(s"waisted[$i]") { val h = fold(waisted); CacheScope.drain(spark); h }
    }
    spark.stop()
  }
}
