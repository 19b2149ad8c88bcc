package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Bloom filter built and probed entirely with declarative column
  * expressions — no UDAF, no serialized sketch objects, nothing outside
  * whole-stage codegen on the probe side.
  *
  * Purpose: SEMI-JOIN REDUCTION. When the build side of an equi-join is
  * too large to broadcast as a join table but the probe side is a 100 TB
  * corpus, shuffling the full corpus on the join key is the dominant
  * cost. An 8 KiB bit array summarizing the build side's keys broadcasts
  * for free and eliminates most probe rows BEFORE the shuffle; false
  * positives are removed by the exact join that follows, so composing
  * `probe + join` is result-identical to the plain join (no false
  * negatives by construction — every build key sets its bits).
  *
  * Construction (all built-ins, deterministic, order-insensitive):
  *   positions: k probe positions per key via Kirsch-Mitzenmacher double
  *     hashing over ONE xxhash64 — pos_i = (h1 + i*h2) mod m, h2 forced
  *     odd so the probe sequence never degenerates;
  *   words: DISTINCT (word, bit) pairs → groupBy(word) + bit_or(mask) —
  *     map-side combinable, at most m/64 groups regardless of build size;
  *   array: one map_from_entries + transform(sequence(...)) assembly into
  *     a single Array[Long] row, broadcast by the caller.
  *
  * m = 2^16 bits (8 KiB). For a benchmark/eval build side of B distinct
  * keys the false-positive rate is (1 - e^{-kB/m})^k — ~1e-3 at B = 4k,
  * k = 3; a deployment summarizing millions of keys should raise
  * NumBits (the cost is linear in broadcast size only).
  */
object Bloom {

  val NumBits: Int = 1 << 16
  val NumWords: Int = NumBits / 64
  val NumProbes: Int = 3

  /** The i-th probe's bit position for a key column, in [0, NumBits). */
  private def probePos(key: Column, i: Int): Column = {
    val h1 = pmod(xxhash64(key), lit(NumBits.toLong))
    // force h2 odd: an even h2 could cycle within a fraction of the table
    val h2 = pmod(shiftright(xxhash64(key), 32), lit(NumBits.toLong))
      .bitwiseOR(lit(1L))
    pmod(h1 + lit(i.toLong) * h2, lit(NumBits.toLong))
  }

  /** Aggregate `df` down to ONE row holding the filter over `key`:
    * (bits: Array[Long] of length NumWords). Broadcast-join this against
    * the probe side.
    */
  def build(df: DataFrame, key: String): DataFrame = {
    val positions = df.select(
      explode(array((0 until NumProbes).map(i => probePos(col(key), i)): _*))
        .as("pos"))
      .distinct()
    positions
      .select((col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int"))
          .as("mask"))
      .groupBy(col("word"))
      .agg(bit_or(col("mask")).as("mask"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask"))))
        .as("wm"))
      .select(expr(
        s"transform(sequence(0, ${NumWords - 1}), w -> coalesce(wm[w], 0L))")
        .as("bloom_bits"))
  }

  /** Membership predicate: every probe bit of `key` is set in `bits`
    * (a column holding the built Array[Long]). Pure codegen'd arithmetic.
    */
  def mightContain(key: Column, bits: Column): Column =
    (0 until NumProbes).map { i =>
      val pos = probePos(key, i)
      val word = element_at(bits, (pos / 64).cast("int") + 1)
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= lit(0L)
    }.reduce(_ && _)
}
