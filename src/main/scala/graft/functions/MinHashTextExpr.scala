package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The K-permutation MinHash signature straight from document TEXT in one
  * fused byte walk — [[SimHashTextExpr]]'s twin for the MinHash family
  * (VERDICT r12 item 4): tokenization, 3-token shingling, per-shingle
  * hashing, and the K min-folds all happen in a single pass over the
  * document's own buffer. No token array, no shingle strings, no shingle
  * ARRAY — the per-document allocations the unfused chain
  * (`split` → [[ShinglesExpr]] → [[MinHashSigExpr]]) pays only for the
  * signature to consume them once.
  *
  * Provably equal to
  * `MinHashSigExpr.sig(ShinglesExpr.shingles(split(trim(text), "\\s+")))`
  * for any text with ≥3 tokens (MinHashTextSpec pins it on corpus text
  * and the whitespace/unicode/repetition edges):
  *   - the byte walk's maximal non-whitespace runs ARE the trim+split
  *     token stream (Java's `\s` is exactly the six ASCII bytes
  *     {space, \t, \n, \x0B, \f, \r}, none of which can appear inside a
  *     UTF-8 multibyte sequence — the [[SimHashTextExpr]] argument) —
  *     including split's EMPTY tokens: `trim` strips 0x20 only and
  *     Spark's split is `split(str, regex, -1)` (trailing empty fields
  *     KEPT, unlike Java's default), so a space-trimmed text that
  *     starts or ends with a non-space `\s` byte carries one "" token
  *     there. [[ShinglesExpr]] hashes those into the boundary windows
  *     and `size(tk)` counts them; the walk reproduces all of it
  *     (unlike [[SimHashExpr]], which SKIPS empty tokens — the families
  *     differ here on purpose, each pinned to its own oracle);
  *   - each window's md5 is fed piecewise (tokA, ' ', tokB, ' ', tokC)
  *     via [[Md5Hash60Expr.computeShingle3]] — md5 is a byte stream, so
  *     piecewise feeding IS hashing the concatenated shingle string;
  *   - [[ShinglesExpr]]'s `array_distinct` dedup is irrelevant under a
  *     min-fold: duplicate shingles produce the same x and the same
  *     `(a·x + b) % p`, which cannot change any minimum. (For documents
  *     with heavy internal repetition the fused walk hashes each window
  *     occurrence — the dedup saved those md5 calls — but it saved them
  *     by first building and probing a per-document hash set of shingle
  *     STRINGS, which costs more than the md5 it avoids.)
  *
  * NULL when the text has fewer than 3 tokens — exactly the documents
  * the unfused pipeline's `size(tk) >= 3` pre-filter drops, so
  * signature-only consumers replace the filter with `isNotNull`.
  *
  * This is the signature path for consumers that never need the stored
  * shingle array (the streaming ingest gate keys LSH bands off `m`
  * alone). The index/batch paths that verify candidates by exact Jaccard
  * keep the unfused chain: they must materialize `sarr` anyway, and a
  * second text walk would redo work the projection already pays for.
  */
case class MinHashTextExpr(
    child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  @transient private lazy val cfg =
    new MinHashSigExpr.Cfg(as.toArray, bs.toArray, p)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashTextExpr.compute(input.asInstanceOf[UTF8String], cfg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfgRef = ctx.addReferenceObj("minhashTextCfg", cfg,
      classOf[MinHashSigExpr.Cfg].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("minhashText")
      s"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData $r =
         |  graft.functions.MinHashTextExpr.compute($c, $cfgRef);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashTextExpr {

  /** Column form: the K per-permutation minima of whitespace-tokenized,
    * 3-shingled text; NULL under 3 tokens.
    */
  def sig(text: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    Shims.column(MinHashTextExpr(Shims.expression(text), as, bs, p))

  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  def compute(s: UTF8String, cfg: MinHashSigExpr.Cfg): GenericArrayData = {
    // resolve to an on-heap byte range; one copy per DOCUMENT at worst
    // (off-heap base), never per token or shingle
    val n = s.numBytes()
    var arr: Array[Byte] = null
    var start = 0
    s.getBaseObject match {
      case a: Array[Byte] =>
        val off = s.getBaseOffset - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        if (off >= 0 && off + n <= a.length) { arr = a; start = off.toInt }
      case _ =>
    }
    if (arr == null) { arr = s.getBytes; start = 0 }

    val k = cfg.as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    // ring of the last 3 token ranges (absolute offset into arr, length)
    val offs = new Array[Int](3)
    val lens = new Array[Int](3)
    var t = 0 // tokens completed
    var i = 0
    // split's empty-token quirks: trim strips 0x20 only, and Spark's
    // split(str, regex) is split(str, regex, -1) — unlike Java's
    // default it KEEPS a trailing empty field. So the token stream
    // carries one "" at position 0 when the space-trimmed text STARTS
    // with a non-space \s byte, and one "" at the end when it ENDS with
    // one; both participate in their windows and in size(tk). (An
    // all-separator trimmed text is exactly the two empties, size 2 —
    // dropped by the >= 3 filter on both paths.)
    while (i < n && arr(start + i) == 0x20) i += 1
    if (i < n && isWs(arr(start + i))) {
      offs(0) = start
      lens(0) = 0
      t = 1
    }
    var e = n
    while (e > 0 && arr(start + e - 1) == 0x20) e -= 1
    val trailingEmpty = e > 0 && isWs(arr(start + e - 1))
    while (i < n) {
      while (i < n && isWs(arr(start + i))) i += 1
      val t0 = i
      while (i < n && !isWs(arr(start + i))) i += 1
      if (i > t0) {
        offs(t % 3) = start + t0
        lens(t % 3) = i - t0
        if (t >= 2) {
          val a = (t - 2) % 3
          val b = (t - 1) % 3
          val c = t % 3
          val x = Md5Hash60Expr.computeShingle3(arr,
            offs(a), lens(a), offs(b), lens(b), offs(c), lens(c)) % cfg.p
          var j = 0
          while (j < k) {
            val v = (cfg.as(j) * x + cfg.bs(j)) % cfg.p
            if (v < mins(j)) mins(j) = v
            j += 1
          }
        }
        t += 1
      }
    }
    if (trailingEmpty) {
      offs(t % 3) = start
      lens(t % 3) = 0
      if (t >= 2) {
        val a = (t - 2) % 3
        val b = (t - 1) % 3
        val c = t % 3
        val x = Md5Hash60Expr.computeShingle3(arr,
          offs(a), lens(a), offs(b), lens(b), offs(c), lens(c)) % cfg.p
        var j = 0
        while (j < k) {
          val v = (cfg.as(j) * x + cfg.bs(j)) % cfg.p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      t += 1
    }
    if (t < 3) return null
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }
}
