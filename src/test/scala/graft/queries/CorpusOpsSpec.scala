package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Semantic pins for the round-6 corpus-prep operators beyond the DuckDB
  * oracle gate: structural invariants (chunk coverage, span-removal
  * consistency, sampling monotonicity) that would stay true under data
  * drift, not just on this fixture.
  */
class CorpusOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("chunking covers every token exactly and respects the overlap") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = CorpusOpsQueries.qChunkOverlap(spark, sf)
      .select(col("doc_id"), col("chunk_id"), col("start_tok"), col("end_tok"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))

    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docs.keySet, "every doc is chunked")
    for ((id, cs) <- byDoc) {
      val sorted = cs.sortBy(_._2)
      val n = docs(id)
      // chunk ids are dense from 0; first chunk starts at 1; last ends at n
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq)
      assert(sorted.head._3 == 1 && sorted.last._4 == n)
      // union of [start, end] covers 1..n with no gap (stride < size)
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1), (_, _, s2, _)) =>
          assert(s2 <= e1 + 1, s"gap in doc $id")
        case _ =>
      }
      // every non-tail chunk holds exactly ChunkSize tokens
      sorted.dropRight(1).foreach { case (_, _, s, e) => assert(e - s + 1 == 64) }
    }
  }

  test("repeated-span removal: clean docs keep their text, dup spans vanish") {
    val out = CorpusOpsQueries.qExactSubstr(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    val withDup = out.filter(_._3 > 0)
    assert(withDup.nonEmpty, "fixture contains duplicated 5-gram spans")
    for ((id, nTok, nDup, cleanHash) <- out) {
      val norm = texts(id).trim.split("\\s+").toSeq
      assert(nTok == norm.size)
      if (nDup == 0) {
        // untouched docs round-trip bit-for-bit through the rebuild
        assert(cleanHash == md5hex(norm.mkString(" ")), s"doc $id changed")
      } else {
        assert(nDup >= 5, s"a covered span is at least one 5-gram (doc $id)")
        assert(cleanHash != md5hex(norm.mkString(" ")) || nDup == nTok)
      }
    }
    // a 5-gram duplicated across two docs must be flagged in BOTH
    val dupPair = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk)-4), i -> concat_ws(' ', slice(tk, i, 5)))"))
        .as("sh"))
      .groupBy("sh").agg(countDistinct("doc_id").as("d"))
      .filter(col("d") >= 2).count()
    if (dupPair > 0) assert(withDup.length >= 2)
  }

  test("vocab OOV accounting is conserved corpus-wide") {
    val out = CorpusOpsQueries.qVocabOov(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalTokens = out.map(_._2).sum
    val totalOov = out.map(_._3).sum
    // in-vocab instances = instances of the top-20 tokens, recomputed
    // independently from raw text
    val inVocab = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok").asc)
      .limit(20)
      .agg(sum("count")).collect()(0).getLong(0)
    assert(totalOov == totalTokens - inVocab)
    assert(out.forall { case (_, n, o) => o >= 0 && o <= n })
  }

  test("contamination fraction agrees with the binary decontaminate gate") {
    val flagged = PipelineQueries.qDecontaminate(spark, sf)
      .select(col("train_doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val frac = CorpusOpsQueries.qContamFraction(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // every doc the binary gate flags (>=2 shared shingles with one
    // benchmark doc) must show a strictly positive fraction here
    assert(flagged.nonEmpty && flagged.forall(id => frac(id) > 0))
    // and the fraction is a probability
    assert(frac.values.forall(f => f >= 0 && f <= 1))
  }

  test("importance sampling keeps every certain-probability row") {
    val out = CorpusOpsQueries.qImportanceSample(spark, sf)
      .collect().map(r => r.getLong(0)).toSet
    val certain = Tables.documents(spark, sf)
      .filter(col("n_chars") >= 400).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(certain.subsetOf(out), "p=1 rows can never be dropped")
    val all = Tables.documents(spark, sf).count()
    assert(out.size < all, "sub-certain rows are actually subsampled")
  }

  test("covariance: PSD diagonal and driver-side agreement on sample cells") {
    val cov = CorpusOpsQueries.qEmbedCovariance(spark, sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(cov.size == 65 * 64 / 2, "full upper triangle")
    // variances are non-negative (within one 1e-8 unit)
    for (d <- 0 until 64) assert(cov((d, d)) >= -1L, s"var($d)")
    // spot-check two cells against a plain driver-side computation
    val vecs = Tables.embeddings(spark, sf).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    for ((i, j) <- Seq((0, 0), (3, 17))) {
      val exact = vecs.map(v => v(i) * v(j)).sum / n -
        (vecs.map(_(i)).sum / n) * (vecs.map(_(j)).sum / n)
      assert(math.abs(cov((i, j)) / 1e8 - exact) < 1e-5, s"cov($i,$j)")
    }
  }

  test("source report is conserved against whole-corpus totals") {
    val rep = CorpusOpsQueries.qSourceReport(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rep.map(_.getLong(1)).sum == docs.count())
    assert(rep.map(_.getLong(3)).sum ==
      docs.agg(sum(col("n_chars"))).collect()(0).getLong(0))
  }

  test("BPE pair scoring agrees with a driver-side trainer's first merges") {
    // independent in-memory BPE trainer over the same corpus
    val words = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).filter(_._1.length >= 2)
    def pairFreqs(vocab: Array[(Vector[String], Long)]): Map[(String, String), Long] =
      vocab.flatMap { case (syms, wc) =>
        syms.sliding(2).collect { case Vector(a, b) => (a, b) -> wc }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    var vocab = words.map { case (w, c) => w.toVector.map(_.toString) -> c }
    // first distributed candidate == first driver-side merge winner
    val first = CorpusOpsQueries.qBpePairs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val driverFreqs = pairFreqs(vocab)
    val driverTop = driverFreqs.toSeq
      .sortBy { case ((a, b), f) => (-f, a + b) }.head
    assert(first.head._1 == driverTop._1._1 + driverTop._1._2)
    assert(first.head._2 == driverTop._2)
    // three merge rounds are well-formed: frequencies never increase
    var lastBest = Long.MaxValue
    for (_ <- 1 to 3) {
      val freqs = pairFreqs(vocab)
      val ((a, b), f) = freqs.toSeq.sortBy { case ((x, y), g) => (-g, x + y) }.head
      assert(f <= lastBest, "best-pair frequency is non-increasing across merges")
      lastBest = f
      vocab = vocab.map { case (syms, wc) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector -> wc
      }
    }
  }

  test("label centroids match a driver-side recomputation on one label") {
    val rows = CorpusOpsQueries.qLabelCentroids(spark, sf)
      .filter(col("label") === 0).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("label") === 0).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).toArray)
    assert(rows.values.map(_._2).toSet == Set(vecs.length.toLong))
    for (d <- Array(0, 31, 63)) {
      // exact driver-side replay of the integer half-up pipeline:
      // sum of round6 coords in 1e-6 units, half-up divided by n
      val su = vecs.map(v => BigDecimal(v(d).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum * 1000000
      val n = vecs.length
      val exact = ((su.toBigInt * 2 + n) / (2 * n)).toLong // su >= 0 on this fixture... guard:
      val expected =
        if (su >= 0) exact
        else -(((-su.toBigInt) * 2 + n) / (2 * n)).toLong
      assert(rows(d)._1 == expected, s"dim $d: ${rows(d)._1} vs $expected")
    }
  }
}
