package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent sinks over a parquet lake, reproducing the reference's two
  * MySQL write semantics (SURVEY.md §2.1 S7/S8, §8.3):
  *
  *  - upsert (`INSERT ... ON DUPLICATE KEY UPDATE`): last-writer-wins by
  *    key — full loads and the daily weather path
  *    (ref: etl/full_load/violation_etl_history.py:127-154,
  *     etl/full_load/weather_etl_history.py:90-114,
  *     etl/daily_load/weather_etl_daily.py:175-210);
  *  - insert-ignore (`INSERT IGNORE`): first-writer-wins — the daily
  *    violations path (ref: etl/daily_load/violation_etl_daily.py:281-311).
  *
  * Scale design: both writes shuffle exactly once on the key. When a
  * partition column is given (violations.month — the lake layout of
  * SURVEY.md §4.3), only affected partitions are rewritten (dynamic
  * partition overwrite), so a daily increment touching one month never
  * rewrites history. Batch-internal duplicates are resolved before the
  * merge (keep-last for upsert / keep-first for insert-ignore by a
  * stable tiebreak), which makes both operations idempotent: applying
  * the same batch twice equals applying it once (DEPLOYMENT.md:244-249).
  */
object Sinks {

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private def readLake(spark: SparkSession, path: String): Option[DataFrame] =
    if (tableExists(spark, path)) Some(spark.read.parquet(path)) else None

  /** Write to a temp sibling then swap directories. A cached-DataFrame
    * overwrite of the path being read is unsafe (evicted partitions would
    * recompute from a half-overwritten source); the temp-and-rename swap
    * never reads and writes the same files.
    */
  private def safeOverwrite(df: DataFrame, path: String, partitionBy: Seq[String]): Unit = {
    val spark = df.sparkSession
    val tmp = path + "._tmp_" + java.util.UUID.randomUUID.toString.take(8)
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** Last-writer-wins upsert of `batch` into the lake table at `path`.
    *
    * New batch rows take precedence over existing rows with the same key;
    * within the batch, `tiebreak` desc decides (a stable ordering column,
    * e.g. an ingest sequence). One shuffle, on `keys`.
    */
  def upsert(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keys: Seq[String],
      partitionBy: Seq[String] = Nil,
      tiebreak: Option[String] = None): Unit = {
    val newRows = batch.withColumn("_precedence", lit(1))
    val merged = readLake(spark, path) match {
      case None => newRows
      case Some(existing) =>
        existing.withColumn("_precedence", lit(0)).unionByName(newRows)
    }
    val order = col("_precedence").desc +:
      tiebreak.map(c => col(c).desc).toSeq
    val deduped = merged
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn", "_precedence")
    safeOverwrite(deduped, path, partitionBy)
  }

  /** First-writer-wins append of `batch`: rows whose key already exists in
    * the lake are dropped (left-anti join on the key — one shuffle).
    */
  def insertIgnore(
      spark: SparkSession,
      batch: DataFrame,
      path: String,
      keys: Seq[String],
      partitionBy: Seq[String] = Nil,
      tiebreak: Option[String] = None): Unit = {
    // batch-internal dedup: keep-first by tiebreak asc (stable)
    val order = tiebreak.map(c => col(c).asc).toSeq :+ lit(1).asc
    val dedupedBatch = batch
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
    readLake(spark, path) match {
      case None =>
        safeOverwrite(dedupedBatch, path, partitionBy)
      case Some(existing) =>
        val fresh = dedupedBatch.join(
          existing.select(keys.map(col): _*), keys, "left_anti")
        safeOverwrite(existing.unionByName(fresh), path, partitionBy)
    }
  }
}
