package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join and spreads the hot key") {
    // 90% of rows share one hot key
    val large = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 5}" else "hot", i.toLong, i * 1.5)
    }.toDF("key", "row_id", "amount")
    val small = Seq(("hot", "HOT DIM"), ("k0", "D0"), ("k1", "D1"),
      ("k2", "D2"), ("k3", "D3"), ("k4", "D4")).toDF("key", "label")

    val plain = large.join(small, Seq("key"), "inner")
      .select("key", "row_id", "amount", "label")
    val salted = SkewJoin.saltedInnerJoin(large, small, "key", "row_id", salts = 8)
      .select("key", "row_id", "amount", "label")

    val p = plain.collect().map(_.toSeq).toSet
    val s = salted.collect().map(_.toSeq).toSet
    assert(s == p)
    assert(s.size == 2000)

    // the hot key occupies multiple distinct salt groups pre-join
    val saltSpread = large.filter(col("key") === "hot")
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .select("_salt").distinct().count()
    assert(saltSpread == 8)
  }
}
