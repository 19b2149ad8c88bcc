package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located (sort-merge-bucket) joins: both sides pre-bucketed on the
  * join key into the same bucket count, so the join reads bucket i of
  * each side in the same task — NO exchange at query time. At 100 TB
  * this is the difference between re-shuffling the fact table on every
  * join and paying the shuffle once at ingest: the standard layout for
  * a fact table joined repeatedly on the same key (the reference's
  * violations-by-date joins are exactly this shape).
  *
  * Tables are registered as EXTERNAL (explicit path) so nothing lands in
  * the session's default warehouse; `sortBy` on the bucket key lets the
  * sort-merge join skip its sort as well. Spark's native (Hive-free)
  * bucketing applies when the tables are read back BY NAME.
  */
object BucketedLake {

  /** Write `df` as an external bucketed+sorted table, replacing any
    * previous registration of `name`.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, name: String,
      key: String, buckets: Int, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(name)
  }

  /** Read two previously-bucketed tables and join on their bucket key —
    * the plan this produces must contain no Exchange on the join key
    * (PlanSpec pins it). The merge hint models the real use case (two
    * tables each too big to broadcast); without it Spark would broadcast
    * a small test fixture and the co-location would go unexercised.
    */
  def colocatedJoin(spark: SparkSession, leftName: String, rightName: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftName).hint("merge").join(spark.table(rightName).hint("merge"),
      spark.table(leftName)(leftKey) === spark.table(rightName)(rightKey))
}
