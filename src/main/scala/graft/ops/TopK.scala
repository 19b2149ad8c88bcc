package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact per-group top-k via a typed [[Aggregator]] — the user-facing
  * typed-aggregation extension point.
  *
  * A window `row_number() <= k` computes the same result but sorts every
  * group in the shuffle; the aggregator keeps only k elements per group
  * in its buffer, so at 100 TB the shuffle carries k rows per key instead
  * of the whole group (the classic partial top-k push-down a planner
  * can't do through a window function).
  *
  * Elements are (value, id) pairs under descending (value, then ascending
  * id on ties) order, so results are total-ordered and deterministic.
  */
object TopK {

  type Item = (Double, Long)

  private def better(a: Item, b: Item): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Buffer is the current top-k, kept sorted best-first (k is tiny). */
  class TopKAggregator(k: Int) extends Aggregator[Item, List[Item], Seq[Item]] {
    override def zero: List[Item] = Nil

    private def insert(buf: List[Item], x: Item): List[Item] = {
      val (front, back) = buf.span(better(_, x))
      val merged = front ::: x :: back
      if (merged.length > k) merged.take(k) else merged
    }

    override def reduce(buf: List[Item], x: Item): List[Item] = insert(buf, x)
    override def merge(a: List[Item], b: List[Item]): List[Item] =
      b.foldLeft(a)(insert)
    override def finish(buf: List[Item]): Seq[Item] = buf
    override def bufferEncoder: Encoder[List[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Item]]()
    override def outputEncoder: Encoder[Seq[Item]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Item]]()
  }

  /** Top-k (valueCol, idCol) rows per group, exploded to
    * (group, rank, id, value) rows.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      idCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKAggregator(k).toColumn
    df.select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("v"), col(idCol).cast("long").as("id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("top"))
      .toDF("grp", "top")
      .select(col("grp"), posexplode(col("top")).as(Seq("pos", "item")))
      .select(
        col("grp").as(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("item._2").as(idCol),
        col("item._1").as(valueCol))
  }
}
