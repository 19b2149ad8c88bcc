package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Invariants of the feature-store operators beyond oracle equality:
  * the PIT join must never read the future, trailing windows must bound
  * their own counts, negative samples must be true negatives, and the
  * EWMA must sit inside the value range it averages.
  */
class FeatureSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q_pit_join: the attached state really is the last one at or before ts") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
    val states = e.filter(r => Set("signup", "error")(r.getString(3)))
    val got = FeatureQueries.qPitJoin(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (eid, uid, ts, at) =
        (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3))
      val prior = states.filter(s => s.getLong(0) == uid &&
        !s.getTimestamp(1).after(ts))
      val expected =
        if (prior.isEmpty) "none"
        else prior.maxBy(s => (s.getTimestamp(1).getTime, s.getLong(2))).getString(3)
      assert(at == expected, s"fact $eid: state $at != recomputed $expected")
    }
  }

  test("q_trailing_features: purchase count bounded by event count, both >= 1") {
    FeatureQueries.qTrailingFeatures(spark, sf).collect().foreach { r =>
      val (ne, np) = (r.getLong(2), r.getLong(3))
      // the fact row itself is inside its own window
      assert(np >= 1 && ne >= np, s"event ${r.getLong(0)}: n=$ne purchases=$np")
    }
  }

  test("q_negative_sample: no sampled pair was ever bought; <= 3 per customer") {
    val bought = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val partKeys = Tables.part(spark, sf).select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val got = FeatureQueries.qNegativeSample(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (ck, rows) =>
      assert(rows.length <= 3, s"customer $ck has ${rows.length} negatives")
      assert(rows.map(_.getInt(2).toLong).sorted.sameElements(1L to rows.length))
    }
    got.foreach { r =>
      val pair = (r.getLong(0), r.getLong(1))
      assert(!bought(pair), s"negative sample $pair was actually bought")
      assert(partKeys(r.getLong(1)), s"sampled part ${r.getLong(1)} does not exist")
    }
  }

  test("q_ewma: average lies within the min..max of the values it weights") {
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value")).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getDouble(1)) }
    FeatureQueries.qEwma(spark, sf).collect().foreach { r =>
      val (uid, n, ewma) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val vs = purchases(uid)
      assert(n == math.min(8L, vs.length))
      val lo = (vs.min * 1e6 - 1).toLong
      val hi = (vs.max * 1e6 + 1).toLong
      assert(ewma >= lo && ewma <= hi, s"user $uid: ewma $ewma outside [$lo,$hi]")
    }
  }
}
