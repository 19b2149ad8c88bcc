package graft.queries

import graft.SparkSpec

/** Independent pin for the PII scrubbing pass: the corpus text itself is
  * digit- and @-free word salad, so every match must come from the
  * deterministically planted PII — counts are exactly the plant moduli,
  * never more (a regex over-matching prose) and never less (a regex
  * failing to fire).
  */
class PiiSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("per-type counts equal the planted occurrences exactly") {
    val rows = TextQueries.qPiiRedact(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_email") == (if (id % 3 == 0) 1 else 0), s"doc $id email")
      assert(r.getAs[Int]("n_phone") == (if (id % 4 == 0) 1 else 0), s"doc $id phone")
      assert(r.getAs[Int]("n_ip") == (if (id % 5 == 0) 1 else 0), s"doc $id ip")
    }
  }
}
