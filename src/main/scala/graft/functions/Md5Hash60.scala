package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's portable deterministic hash,
  * `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)` — the value
  * of the first 15 md5 hex digits, i.e. the digest's top 60 bits — as ONE
  * native expression. DuckDB replays the declarative form bit-for-bit
  * (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`), which is why every
  * sampling / splitting / salting / sketch-hash op in the engine is built
  * on it; but the builtin chain materializes a 32-char hex STRING per row
  * and then re-parses 15 of those chars back into a long. This expression
  * reads the top 8 digest bytes directly (big-endian >>> 4 — the same
  * identity [[CdcChunksExpr]] uses, spec-pinned), skipping the hex
  * round-trip and its allocations on hash-heavy paths (the Poisson
  * bootstrap evaluates it 32x per event; shingle sketches once per
  * shingle instance).
  *
  * Consumers keep their `% K` / comparison arithmetic declarative, so
  * each call site stays textually close to its DuckDB oracle.
  * Md5Hash60Spec pins native == declarative chain on ids, salted
  * composites, and unicode.
  */
case class Md5Hash60Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.Md5Hash60Expr.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60Expr {

  private val Md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  // reused per-thread digest output; MessageDigest.digest() otherwise
  // allocates a fresh 16-byte array per call — per TOKEN on the sketch
  // paths (round 12: the signature pass spent more on these little
  // allocations + the getBytes copy below than on MD5 itself)
  private val Out = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** Column form: top 60 bits of md5(s) as a non-negative long. */
  def of(s: Column): Column = Shims.column(Md5Hash60Expr(Shims.expression(s)))

  /** Same top-60-bits-of-md5 hash over a byte RANGE — the zero-copy,
    * zero-allocation entry point for fused per-token walks
    * ([[SimHashTextExpr]]): the token bytes are hashed in place inside
    * the document's buffer.
    */
  def computeRange(arr: Array[Byte], off: Int, len: Int): Long = {
    val md = Md5.get()
    md.reset()
    md.update(arr, off, len)
    finishTop60(md)
  }

  private val SpaceByte: Byte = ' '

  /** Top-60-bits-of-md5 of a 3-token shingle `tokA + ' ' + tokB + ' '
    * + tokC`, fed to the digest straight from the document buffer —
    * bit-identical to [[computeRange]] over the concatenated string
    * (md5 is a byte stream; feeding the pieces IS feeding the concat)
    * without ever materializing the shingle. The fused-minhash entry
    * point ([[MinHashTextExpr]]).
    */
  def computeShingle3(arr: Array[Byte],
      o1: Int, l1: Int, o2: Int, l2: Int, o3: Int, l3: Int): Long = {
    val md = Md5.get()
    md.reset()
    md.update(arr, o1, l1)
    md.update(SpaceByte)
    md.update(arr, o2, l2)
    md.update(SpaceByte)
    md.update(arr, o3, l3)
    finishTop60(md)
  }

  private def finishTop60(md: MessageDigest): Long = {
    val d = Out.get()
    md.digest(d, 0, 16)
    val top =
      (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
      (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
      (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
      (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
    top >>> 4
  }

  def compute(s: UTF8String): Long = {
    val md = Md5.get()
    md.reset()
    // feed the digest in place when the string is backed by an on-heap
    // byte[] (split tokens, parquet-scan strings): UTF8String.getBytes
    // copies every slice into a fresh array otherwise
    val base = s.getBaseObject
    val nb = s.numBytes()
    base match {
      case arr: Array[Byte] =>
        val off = s.getBaseOffset - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
        if (off >= 0 && off + nb <= arr.length) md.update(arr, off.toInt, nb)
        else md.update(s.getBytes)
      case _ => md.update(s.getBytes)
    }
    val d = Out.get()
    md.digest(d, 0, 16)
    val top =
      (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
      (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
      (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
      (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
    top >>> 4
  }
}
