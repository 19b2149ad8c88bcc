package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.MisraGries

/** Specs for the lake-maintenance and curation operators beyond what the
  * DuckDB oracle gate already pins (the gate proves result equality; these
  * prove the ALGORITHMIC guarantees and the invariants the oracle can't
  * see).
  */
class LakeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // --- Misra-Gries: the frequency guarantee, directly on the Aggregator ---

  test("MisraGries retains every key with frequency > N/k (adversarial stream)") {
    // 3 heavy keys + 200 singleton tail keys, k = 8 -> eviction churns
    val heavy = Seq.fill(300)("A") ++ Seq.fill(250)("B") ++ Seq.fill(200)("C")
    val tail = (0 until 200).map(i => s"t$i")
    val stream = scala.util.Random.shuffle(heavy ++ tail ++ tail) // N = 1150
    val k = 8
    val mg = new MisraGries(k)
    val n = stream.size
    // simulate distributed partial aggregation: 7 partitions, merged
    val parts = stream.grouped(math.ceil(n / 7.0).toInt).toSeq
    val partials = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
    val merged = partials.reduce(mg.merge)
    val result = mg.finish(merged).toSet
    val threshold = n.toDouble / k
    for ((key, freq) <- Seq("A" -> 300, "B" -> 250, "C" -> 200))
      if (freq > threshold)
        assert(result.contains(key), s"heavy key $key (freq $freq > N/k $threshold) evicted")
    assert(merged.size <= k, s"sketch grew past k: ${merged.size}")
  }

  test("MisraGries merge is order-insensitive on the guarantee set") {
    val mg = new MisraGries(4)
    val s1 = Seq.fill(50)("x") ++ (0 until 30).map(i => s"a$i")
    val s2 = Seq.fill(40)("x") ++ (0 until 30).map(i => s"b$i")
    val b1 = s1.foldLeft(mg.zero)(mg.reduce)
    val b2 = s2.foldLeft(mg.zero)(mg.reduce)
    // x has freq 90 of N=150 > N/4; must survive either merge order
    assert(mg.finish(mg.merge(b1, b2)).contains("x"))
    assert(mg.finish(mg.merge(b2, b1)).contains("x"))
  }

  test("q_heavy_hitters: every exact-heavy key is in the sketch") {
    val out = LakeOpsQueries.qHeavyHitters(spark, sf).collect()
    assert(out.nonEmpty, "fixture must produce heavy keys")
    assert(out.forall(_.getBoolean(2)), "MG guarantee violated: heavy key missing")
  }

  // --- gap fill: spine completeness and fill semantics ---

  test("q_gap_fill: spine is dense per user and forward fill never nulls") {
    val out = LakeOpsQueries.qGapFill(spark, sf)
    val perUser = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_days"),
        (datediff(max(to_date(col("day"))), min(to_date(col("day")))) + 1)
          .as("span_days"),
        sum(when(col("filled_value").isNull, 1).otherwise(0)).as("n_null"))
      .collect()
    assert(perUser.nonEmpty)
    perUser.foreach { r =>
      assert(r.getLong(1) == r.getInt(2).toLong,
        s"user ${r.get(0)}: spine has ${r.getLong(1)} days, span is ${r.getInt(2)}")
      assert(r.getLong(3) == 0L, s"user ${r.get(0)}: forward fill left nulls")
    }
  }

  // --- compaction plan: bins respect ordering and the overshoot bound ---

  test("q_compaction_plan: bins are contiguous doc_id ranges per source") {
    val out = LakeOpsQueries.qCompactionPlan(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (_, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(5) < b.getLong(4),
            "bin file ranges overlap: compaction would rewrite a file twice")
        case _ => ()
      }
    }
  }

  // --- snapshot diff: classes partition the key universe ---

  test("q_snapshot_diff: class counts cover the union of both snapshots") {
    val out = LakeOpsQueries.qSnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.Tables.orders(spark, sf)
    val union = o.filter(col("o_orderkey") % 97 =!= 0 || col("o_orderkey") % 89 =!= 0)
      .count()
    assert(out.values.sum == union,
      s"diff classes sum ${out.values.sum} != key universe $union")
    assert(out.contains("added") && out.contains("removed") && out.contains("changed"))
  }

  // --- CDC apply: op semantics per key class ---

  test("q_ref_integrity: orphan counts equal the dropped-slice membership") {
    val rows = LakeOpsQueries.qRefIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("orders->customer", "lineitem->orders"))
    // orphan orders are exactly those referencing a customer ending in 3
    val o = Tables.orders(spark, sf)
    val expOrd = o.filter(col("o_custkey") % 10 === 3).count()
    assert(rows("orders->customer")._1 == expOrd)
    assert(rows("orders->customer")._2 == o.count())
    // every lineitem orphan references an order key = 2 mod 7
    val l = Tables.lineitem(spark, sf)
    val expLi = l.filter(col("l_orderkey") % 7 === 2).count()
    assert(rows("lineitem->orders")._1 == expLi)
    rows.values.foreach { case (orphans, total, bp) =>
      assert(bp == 10000L * orphans / total)
      assert(orphans > 0, "fixture must actually produce orphans")
    }
  }

  test("q_cdc_apply: deletes drop, updates win, inserts persist") {
    val out = LakeOpsQueries.qCdcApply(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val orig = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    orig.foreach { case (k, p) =>
      if (k % 7 == 0) assert(!out.contains(k), s"deleted key $k survived")
      else if (k % 3 == 0) assert(out(k) == p + 10.0, s"update lost on $k")
      else assert(out(k) == p, s"insert mutated on $k")
    }
  }

  // --- fuzzy match: the planted match wins unless a true tie beats it ---

  test("q_fuzzy_match: every probe resolves at distance <= 1") {
    val out = CurationQueries.qFuzzyMatch(spark, sf).collect()
    assert(out.nonEmpty)
    // dirty names were made by one deletion, so the planted match is at
    // distance 1; the resolver may pick an equally-close smaller key but
    // never anything worse
    out.foreach(r => assert(r.getLong(3) <= 1L,
      s"probe ${r.getLong(0)} resolved at distance ${r.getLong(3)}"))
  }

  // --- perplexity: terciles are balanced within each language ---

  test("q_perplexity: ntile buckets differ by at most one doc per lang") {
    val out = CurationQueries.qPerplexity(spark, sf).collect()
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val sizes = rows.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1, s"$lang terciles unbalanced: ${sizes.toSeq}")
      // head must be more LM-like (lower neg log prob) than tail
      val byBucket = rows.sortBy(_.getInt(1))
      assert(byBucket.head.getDouble(3) <= byBucket.last.getDouble(4),
        s"$lang: head min_nlp above tail max_nlp")
    }
  }

  // --- drift: KL is non-negative and self-drift is zero ---

  test("q_dist_drift: KL >= 0 for every source") {
    val out = CurationQueries.qDistDrift(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(3) >= -1e-9,
        s"source ${r.getString(0)}: negative KL ${r.getDouble(3)}")
    }
  }
}
