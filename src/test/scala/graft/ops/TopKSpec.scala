package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals the window formulation incl. ties") {
    val df = Seq(
      ("a", 10.0, 1L), ("a", 30.0, 2L), ("a", 20.0, 3L), ("a", 30.0, 4L),
      ("b", 5.0, 5L), ("b", 5.0, 6L),
      ("c", 1.0, 7L))
      .toDF("grp", "v", "id")
    val got = TopK.topKPerGroup(df, "grp", "v", "id", k = 2)
      .orderBy("grp", "rank").collect().map(_.toSeq)
    val want = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= 2)
      .select(col("grp"), col("rank"), col("id"), col("v"))
      .orderBy("grp", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
    // tie on 30.0: id 2 before id 4
    assert(got(0) == Seq("a", 1, 2L, 30.0) && got(1) == Seq("a", 2, 4L, 30.0))
  }

  test("property: aggregator == window on generated data (heavy ties, k=1 and k=3)") {
    // value domain of 5 forces ties constantly; 16 partitions force the
    // merge path; seeded so failures replay
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = (1 to 400).map { i =>
      (s"g${rnd.nextInt(9)}", rnd.nextInt(5).toDouble, i.toLong)
    }
    val df = rows.toDF("grp", "v", "id").repartition(16)
    Seq(1, 3).foreach { k =>
      val got = TopK.topKPerGroup(df, "grp", "v", "id", k)
        .orderBy("grp", "rank").collect().map(_.toSeq).toSeq
      val want = df
        .withColumn("rank", row_number().over(
          Window.partitionBy("grp").orderBy(col("v").desc, col("id"))))
        .filter(col("rank") <= k)
        .select(col("grp"), col("rank"), col("id"), col("v"))
        .orderBy("grp", "rank").collect().map(_.toSeq).toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("aggregator merge path: many partitions, k larger than some groups") {
    val df = spark.range(1000)
      .select((col("id") % 7).cast("string").as("grp"),
        (col("id") * 13 % 997).cast("double").as("v"), col("id").as("id"))
      .repartition(8)
    val got = TopK.topKPerGroup(df, "grp", "v", "id", k = 5)
    assert(got.count() == 35)
    val byGroup = got.groupBy("grp").agg(count(lit(1))).collect()
    assert(byGroup.forall(_.getLong(1) == 5))
    // ranks strictly ordered by value desc within groups
    val bad = got.withColumn("prev", lag(col("v"), 1).over(
      Window.partitionBy("grp").orderBy("rank")))
      .filter(col("prev").isNotNull && col("prev") < col("v")).count()
    assert(bad == 0)
  }
}
