package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key carries a disproportionate share of rows (hot
  * agencies, hot dates), a plain hash join sends the whole hot key to one
  * task. Salting splits the skewed (large) side into `salts` sub-keys and
  * explodes the small side across all salts, so the hot key spreads over
  * `salts` tasks. AQE's skew-join handles sort-merge cases adaptively;
  * this is the explicit form for when the optimizer can't (e.g.
  * pre-aggregation layouts, deterministic tests, non-AQE environments).
  *
  * The salt on the large side is deterministic (hash of the row's other
  * columns mod salts would be non-reproducible across retries if based on
  * random; we use pmod(hash(salt source column), salts)).
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, salted `salts` ways.
    *
    * @param saltSource a column of `large` whose hash distributes rows
    *   within a hot key (e.g. a unique id).
    */
  def saltedInnerJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: String,
      salts: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("_salt",
      pmod(hash(col(saltSource)), lit(salts)))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
