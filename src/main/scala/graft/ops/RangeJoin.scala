package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized interval-containment join — the scale-safe form of
  * `probe.ts BETWEEN interval.start AND interval.end`.
  *
  * Spark has no native range join: the naive formulation (equi-key plus
  * two inequalities) planss the inequality pair as a post-filter on the
  * key join — fine when keys are selective, but a BroadcastNestedLoopJoin
  * or a skewed mega-group when they aren't. Binning is the standard fix
  * (Databricks' range-join optimization, Flink's interval join): slice
  * time into fixed-width buckets, register each interval in EVERY bucket
  * it overlaps, map each probe row to the ONE bucket containing its
  * timestamp, and equi-join on (key, bucket) before applying the exact
  * containment predicate.
  *
  * Properties:
  *  - the join is a plain hash equi-join — shuffle on (key, bucket),
  *    map-side combinable, AQE-skew-splittable; no nested loop anywhere;
  *  - no candidate duplication: a probe row lives in exactly one bucket,
  *    so each (probe, interval) pair meets at most once — no post-dedup;
  *  - fan-out is bounded by interval length / bucketWidth + 1: pick the
  *    width near the TYPICAL interval length so most intervals register
  *    in 1-2 buckets (a 100 TB deployment tunes this per table).
  */
object RangeJoin {

  /** Inner-join `probes` to the `intervals` rows whose [startCol, endCol]
    * contains the probe's tsCol, matching on `key` first. Timestamps are
    * compared as epoch seconds; bucketWidthSec is the bin size. Both
    * inputs keep all their columns (names must not collide apart from
    * `key`).
    */
  def containmentJoin(
      intervals: DataFrame,
      probes: DataFrame,
      key: String,
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketWidthSec: Long): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketWidthSec).cast("long")
    val ib = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    val pb = probes.withColumn("_bucket", bucketOf(col(tsCol)))
    pb.join(ib, Seq(key, "_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval × interval OVERLAP join (`a.start <= b.end AND b.start <=
    * a.end`), bucketized the same way — but with interval inputs on BOTH
    * sides a pair can now meet in every bucket their overlap spans, so
    * the join would emit duplicates. The standard fix (used by the
    * Databricks range-join optimization) avoids a post-`distinct`
    * entirely: emit the pair only in the bucket containing
    * `greatest(a.start, b.start)`. For an overlapping pair that instant
    * lies inside BOTH intervals, so both sides are registered in that
    * bucket, and it is a single well-defined bucket — each qualifying
    * pair meets exactly once. Cost stays one hash equi-join on the
    * bucket id; fan-out per interval is len/bucketWidth + 1.
    *
    * Column names from the two inputs must not collide.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidthSec: Long): DataFrame = {
    def bucketOf(c: Column): Column =
      floor(unix_timestamp(c) / bucketWidthSec).cast("long")
    val lb = left.withColumn("_bucket",
      explode(sequence(bucketOf(col(lStart)), bucketOf(col(lEnd)))))
    val rb = right.withColumn("_rbucket",
      explode(sequence(bucketOf(col(rStart)), bucketOf(col(rEnd)))))
    lb.join(rb, col("_bucket") === col("_rbucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(bucketOf(greatest(col(lStart), col(rStart))) === col("_bucket"))
      .drop("_bucket", "_rbucket")
  }
}
