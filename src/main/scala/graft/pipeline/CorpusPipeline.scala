package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.ConnectedComponents

/** Composable corpus-preparation pipeline — the user-facing surface that
  * chains the engine's training-data operators into one lazy plan:
  *
  * {{{
  * CorpusPipeline(docs)
  *   .dedupExact()
  *   .dedupNear(nearDupPairs)            // e.g. SimHash/MinHash pair output
  *   .decontaminate(benchmarkDocs)
  *   .sampleStratified(Map("en" -> 0.5), default = 0.2)
  *   .withSplit(trainPct = 90)
  *   .df                                  // still unexecuted — one plan
  * }}}
  *
  * Every stage is a pure DataFrame -> DataFrame transform (no actions, no
  * driver materialization except dedupNear's bounded component loop), so
  * the composed pipeline is ONE Catalyst plan: filters merge, column
  * pruning reaches the scan, and the whole chain benefits from AQE.
  * Stage semantics match the oracle-gated queries one-to-one (the spec
  * pins pipeline output against q_dedup_apply / q_sample_stratified /
  * q_train_test_split on the shared testdata).
  */
final class CorpusPipeline private (
    val df: DataFrame,
    val idCol: String) {

  private def next(d: DataFrame): CorpusPipeline = new CorpusPipeline(d, idCol)

  /** Exact dedup: keep the minimum-id document per identical text. */
  def dedupExact(textCol: String = "text"): CorpusPipeline = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    next(df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn"))
  }

  /** Near-dedup application: given a pair list (two id columns) from any
    * detector (SimHash, MinHash, embedding blocking), resolve groups via
    * connected components and keep only each group's minimum id.
    */
  def dedupNear(pairs: DataFrame): CorpusPipeline = {
    val nonCanonical = ConnectedComponents.components(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    next(df.join(nonCanonical, Seq(idCol), "left_anti"))
  }

  /** Decontamination: drop docs sharing >= minShared distinct 3-gram
    * shingles with any benchmark doc. Benchmark side broadcasts (real
    * eval suites are tiny next to a corpus).
    */
  def decontaminate(
      benchmark: DataFrame,
      textCol: String = "text",
      minShared: Int = 2): CorpusPipeline = {
    def shingled(d: DataFrame, idc: String): DataFrame = d
      .select(col(idc), split(trim(col(textCol)), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col(idc), explode(array_distinct(expr(
        "transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
        .as("_shingle"))
    val contaminated = shingled(df, idCol)
      .join(broadcast(
        shingled(benchmark.withColumnRenamed(idCol, "_bench_id"), "_bench_id")),
        "_shingle")
      .groupBy(col(idCol), col("_bench_id"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minShared)
      .select(col(idCol)).distinct()
    next(df.join(contaminated, Seq(idCol), "left_anti"))
  }

  /** Deterministic stratified sampling: per-stratum keep rates decided by
    * a portable md5 hash of the id — a plain filter, reproducible across
    * engines and partitionings.
    */
  def sampleStratified(
      rates: Map[String, Double],
      default: Double,
      stratumCol: String = "lang"): CorpusPipeline = {
    val bucket = expr(
      s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint) % 10000")
    val threshold = rates.foldLeft(lit((default * 10000).toLong)) {
      case (acc, (k, v)) =>
        when(col(stratumCol) === k, lit((v * 10000).toLong)).otherwise(acc)
    }
    next(df.filter(bucket < threshold))
  }

  /** Salted deterministic train/test split as a new column. */
  def withSplit(trainPct: Int, salt: String = "split42"): CorpusPipeline =
    next(df.withColumn("split",
      when(expr(
        s"cast(conv(substring(md5(concat('$salt:', cast($idCol as string))), 1, 15), 16, 10) as bigint) % 100")
        < trainPct, "train").otherwise("test")))
}

object CorpusPipeline {
  def apply(docs: DataFrame, idCol: String = "doc_id"): CorpusPipeline =
    new CorpusPipeline(docs, idCol)
}
