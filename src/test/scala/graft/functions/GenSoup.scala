package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Shared seeded generators for the fused-expression property laws.
  *
  * The round-13 lesson: a fused expression pinned only to corpus text
  * and handcrafted edges can still diverge from its declarative chain on
  * boundary shapes nobody thought to write down — the MinHash fused walk
  * passed its corpus pin AND its DuckDB oracle while mishandling
  * trailing empty tokens, and the whitespace-soup law caught it on
  * 39/48 generated texts. Every law draws from these generators with
  * fixed seeds (same reproducibility discipline as etl.PropertySpec; the
  * scalatest bridge artifact isn't a declared dependency, so raw
  * pureApply).
  */
object GenSoup {

  private val wsChars = Seq(' ', '\t', '\n', '\u000B', '\f', '\r')

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.nonEmptyListOf(Gen.oneOf('é', 'ß', '語', '≠', 'a', '7')).map(_.mkString),
    Gen.const("a"))

  /** Whitespace/unicode soup TEXT: 0–12 tokens separated by arbitrary
    * runs of all six `\s` bytes, with leading/trailing separator
    * variants — the shapes where trim/split boundary semantics live.
    */
  val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(n + 1, Gen.nonEmptyListOf(Gen.oneOf(wsChars)).map(_.mkString))
    lead <- Gen.oneOf("", " ", "\t", "\n ", "  \t")
  } yield lead + seps.zip(toks :+ "").map { case (s, t) => s + t }.mkString

  /** Token ARRAYS as split could emit them and worse: empty strings,
    * heavy duplicates, unicode — for expressions consuming
    * `array<string>` directly.
    */
  val tokenArrayGen: Gen[Seq[String]] = for {
    n <- Gen.choose(0, 24)
    toks <- Gen.listOfN(n, Gen.oneOf(
      tokenGen, Gen.const(""), Gen.oneOf("a", "b", "t1", "t2")))
  } yield toks

  /** Dense character soup (no token structure): printable ASCII, the
    * `\s` bytes, and multibyte chars, at lengths that cross the 64-
    * sample floor media expressions use.
    */
  val charSoupGen: Gen[String] = for {
    n <- Gen.choose(64, 280)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(33.toChar, 126.toChar),
      2 -> Gen.oneOf(wsChars),
      2 -> Gen.oneOf('é', 'ß', '語', '≠', 'Ω', 'ж')))
  } yield cs.mkString

  /** Combining-mark soup: ASCII letters interleaved with combining
    * diacritics (U+0300–U+036F), precomposed forms, and Hangul jamo —
    * the shapes where NFC composition actually rewrites the string
    * (including lone marks at position 0 and jamo→syllable runs).
    */
  val combiningSoupGen: Gen[String] = for {
    n <- Gen.choose(1, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.alphaChar,
      3 -> Gen.choose('\u0300', '\u036F'),
      1 -> Gen.oneOf('é', 'ñ', 'Å', 'ö', 'ü'),
      1 -> Gen.oneOf('\u1100', '\u1161', '\u11A8')))
  } yield cs.mkString

  /** Equal-length double-vector pairs with mixed signs and magnitudes
    * (±0.0, 1e±12 scale). The native vector kernels promise folds
    * bit-identical to their declarative twins, so values that stress
    * float summation order matter more than realistic embeddings.
    */
  val vecPairGen: Gen[(Seq[Double], Seq[Double])] = {
    val v = Gen.frequency(
      4 -> Gen.choose(-1.0, 1.0),
      2 -> Gen.choose(-1e12, 1e12),
      2 -> Gen.choose(-1e-12, 1e-12),
      1 -> Gen.oneOf[Double](0.0, -0.0, 1.0, -3.5))
    for {
      n <- Gen.choose(0, 12)
      a <- Gen.listOfN(n, v)
      b <- Gen.listOfN(n, v)
    } yield (a, b)
  }

  /** Timestamps across 1900–2100 at microsecond grain (absolute
    * instants; the sessions render in UTC) — for laws that pin format
    * translation against Spark's own field-extraction functions.
    */
  val timestampGen: Gen[java.sql.Timestamp] = for {
    s <- Gen.choose(-2208988800L, 4102444799L)
    micros <- Gen.frequency(3 -> Gen.choose(0L, 999999L), 1 -> Gen.const(0L))
  } yield java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s, micros * 1000L))

  def sample[A](g: Gen[A], n: Int = 48, seedBase: Long = 0L): Seq[A] =
    (0 until n).map(i =>
      g.pureApply(Gen.Parameters.default.withSize(20), Seed(seedBase + i)))
}
