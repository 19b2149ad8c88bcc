package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Product-quantization pins beyond the oracle gate: structural sanity
  * of the codes, exact self-encoding of codebook vectors (a quantizer
  * that can't reproduce its own codewords is mis-assigning), and ADC
  * retrieval quality against the exact L2 ranking.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("codes are 8 subspace codes in [0,16); codebook vectors self-encode at qerr 0") {
    val rows = PqQueries.qEmbedPq(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").split("-").map(_.toInt)
      assert(codes.length == 8)
      assert(codes.forall(c => c >= 0 && c < 16))
      assert(r.getAs[Double]("qerr") >= 0.0)
    }
    // vec k < 16 supplies codeword k in EVERY subspace, so its nearest
    // codeword is itself everywhere: codes = k-k-...-k, qerr = 0
    rows.filter(_.getAs[Long]("vec_id") < 16).foreach { r =>
      val k = r.getAs[Long]("vec_id").toInt
      assert(r.getAs[String]("codes") == Array.fill(8)(k).mkString("-"),
        s"codebook vector $k did not self-encode")
      assert(r.getAs[Double]("qerr") == 0.0)
    }
  }

  // NOTE on recall: this synthetic table has NO strong neighbor
  // structure (min pairwise squared L2 is 1.26 vs ~2.0 random — no
  // near-duplicates), so a 16-codeword untrained quantizer cannot and
  // should not be asserted to recall exact top-3 here. What defines a
  // correct ADC implementation is the identity below; retrieval quality
  // is a property of codebook size/training vs data structure.
  test("ADC distance equals exact distance to the codeword reconstruction") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    // reconstruction = per-subspace codeword, reassembled in order
    val codes = PqQueries.qEmbedPq(spark, sf)
      .select(col("vec_id"), split(col("codes"), "-").as("cs"))
    val cb = e.filter(col("vec_id") < 16)
      .select(col("vec_id").cast("int").as("k"), col("v").as("cw"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val cbB = spark.sparkContext.broadcast(cb)
    val recon = codes.collect().map { r =>
      val id = r.getAs[Long]("vec_id")
      val cs = r.getSeq[String](1).map(_.toInt)
      id -> cs.zipWithIndex.flatMap { case (c, m) =>
        cbB.value(c).slice(m * 8, m * 8 + 8)
      }.toArray
    }.toMap
    val queries = e.filter(col("vec_id") % 400 === 0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val got = PqQueries.qSimPqTopk(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val q = queries.toMap.apply(r.getAs[Long]("query_id"))
      val x = recon(r.getAs[Long]("neighbor_id"))
      val exact = q.indices.map(i => (q(i) - x(i)) * (q(i) - x(i))).sum
      val adist = r.getAs[Double]("adist")
      // adist rounds each of the 8 subspace terms to 5 decimals first
      assert(math.abs(adist - exact) <= 8 * 0.5e-5 + 1e-9,
        s"ADC identity broken: adist=$adist exact=$exact")
    }
  }
}
