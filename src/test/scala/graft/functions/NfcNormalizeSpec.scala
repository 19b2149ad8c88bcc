package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The NFC expression's contract: canonical composition, idempotence,
  * null passthrough, and survival inside whole-stage codegen.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes decomposed graphemes, idempotent, null-safe") {
    val df = Seq(
      Some("café"),      // e + combining acute -> é
      Some("caf\u00e9"),    // already composed
      Some("plain ascii"),
      None
    ).toDF("s")
    val out = df.select(UnicodeExprs.nfc(col("s")).as("n")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == "caf\u00e9")
    assert(out(1) == "caf\u00e9")
    assert(out(2) == "plain ascii")
    assert(out(3) == null)
    // idempotence: nfc(nfc(x)) == nfc(x)
    val twice = df.select(UnicodeExprs.nfc(UnicodeExprs.nfc(col("s"))).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(twice.toSeq == out.toSeq)
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(100)
      .select(concat(lit("x"), col("id").cast("string")).as("s"))
      .select(UnicodeExprs.nfc(col("s")).as("n"))
      .filter(col("n").isNotNull)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), "no whole-stage codegen stage in plan")
  }
}
