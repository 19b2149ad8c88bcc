package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks (SURVEY.md §5.3): totality of the coercion
  * functions and idempotency/ordering laws of the sinks under arbitrary
  * batches. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest bridge artifact isn't a declared dependency), so runs are
  * reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](g: Gen[A], runs: Int = 8)(f: A => Unit): Unit =
    (0 until runs).foreach { i =>
      f(g.pureApply(Gen.Parameters.default.withSize(20), Seed(i.toLong)))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 6).foreach { i =>
      f(g1.pureApply(Gen.Parameters.default.withSize(20), Seed(i.toLong)),
        g2.pureApply(Gen.Parameters.default.withSize(20), Seed(1000L + i)))
    }

  test("toDoubleSafe is total over arbitrary strings (never throws; " +
    "numeric round-trips, garbage nulls)") {
    val cases = Gen.listOfN(40, Gen.oneOf(
      Gen.choose(-1e9, 1e9).map(_.toString),
      Gen.alphaNumStr,
      Gen.const("NaN"), Gen.const(""), Gen.const(null: String),
      Gen.choose(Long.MinValue, Long.MaxValue).map(_.toString)))
    forAll(cases) { xs =>
      val got = xs.toDF("s")
        .select(col("s"), Transforms.toDoubleSafe(col("s")).as("d"))
        .collect()
      got.foreach { r =>
        val s = r.getAs[String]("s")
        val parsed: Option[Double] =
          Option(s).flatMap(v => scala.util.Try(v.toDouble).toOption)
            .filterNot(_.isNaN)
        parsed match {
          case Some(x) => assert(r.getAs[Double]("d") == x)
          case None => assert(r.isNullAt(1))
        }
      }
    }
  }

  private val batchGen = for {
    n <- Gen.choose(1, 12)
    keys <- Gen.listOfN(n, Gen.choose(1, 6))
    vals <- Gen.listOfN(n, Gen.choose(0, 1000))
  } yield keys.zip(vals).zipWithIndex.map { case ((k, v), i) =>
    (s"k$k", v.toDouble, i, "2024-09")
  }

  private def apply2(
      op: (org.apache.spark.sql.DataFrame, String) => Unit,
      batches: Seq[Seq[(String, Double, Int, String)]]): Map[String, Double] = {
    val path = Files.createTempDirectory("graft-prop").resolve("t").toString
    batches.foreach(b =>
      op(b.toDF("violation_id", "fine_amount", "seq", "month"), path))
    spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("violation_id") -> r.getAs[Double]("fine_amount"))
      .toMap
  }

  test("upsert idempotency: applying a batch twice equals once") {
    forAll(batchGen) { b =>
      val once = apply2((df, p) =>
        Sinks.upsert(spark, df, p, Seq("violation_id"), tiebreak = Some("seq")),
        Seq(b))
      val twice = apply2((df, p) =>
        Sinks.upsert(spark, df, p, Seq("violation_id"), tiebreak = Some("seq")),
        Seq(b, b))
      assert(once == twice)
    }
  }

  test("insert-ignore: first batch wins over any second batch on overlap") {
    forAll(batchGen, batchGen) { (b1, b2) =>
      val merged = apply2((df, p) =>
        Sinks.insertIgnore(spark, df, p, Seq("violation_id"), tiebreak = Some("seq")),
        Seq(b1, b2))
      // keys from b1 keep b1's first-by-seq value
      val b1First = b1.groupBy(_._1).map { case (k, rows) =>
        k -> rows.minBy(_._3)._2 }
      b1First.foreach { case (k, v) => assert(merged(k) == v) }
      // all keys present
      assert(merged.keySet == (b1.map(_._1) ++ b2.map(_._1)).toSet)
    }
  }

  test("upsert: last batch wins over any prior batch on overlap") {
    forAll(batchGen, batchGen) { (b1, b2) =>
      val merged = apply2((df, p) =>
        Sinks.upsert(spark, df, p, Seq("violation_id"), tiebreak = Some("seq")),
        Seq(b1, b2))
      val b2Last = b2.groupBy(_._1).map { case (k, rows) =>
        k -> rows.maxBy(_._3)._2 }
      b2Last.foreach { case (k, v) => assert(merged(k) == v) }
      assert(merged.keySet == (b1.map(_._1) ++ b2.map(_._1)).toSet)
    }
  }

  test("watermark monotonicity: loading more days never lowers the watermark") {
    import java.time.LocalDate
    val path = Files.createTempDirectory("graft-wm-prop").resolve("t").toString
    def day(d: LocalDate) =
      Seq((s"id_$d", java.sql.Date.valueOf(d))).toDF("violation_id", "violation_date")
    var last: Option[LocalDate] = None
    (1 to 5).foreach { i =>
      Sinks.insertIgnore(spark, day(LocalDate.of(2024, 10, i)), path, Seq("violation_id"))
      val wm = Incremental.watermark(spark, path, "violation_date")
      assert(wm.isDefined && last.forall(l => !wm.get.isBefore(l)))
      last = wm
    }
  }
}
