package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The K-permutation MinHash signature of a shingle ARRAY in one
  * compiled pass — the per-row core of the incremental/streaming dedup
  * index (`IncrementalDedupQueries.signatures`). The declarative form
  * ran one interpreted md5→conv lambda per shingle (hex round-trip)
  * plus K=16 separate `array_min(transform(...))` lambdas, each
  * re-walking and re-allocating the hash array; this expression hashes
  * each shingle once ([[Md5Hash60Expr]]'s digest-byte arithmetic, mod p
  * — the same portable value DuckDB replays) and min-folds all K
  * permutations `(a_i·x + b_i) % p` in a tight loop, exactly
  * [[MinPermVec]]'s arithmetic at row grain.
  *
  * Coefficients ride IN the expression (and reach generated code via
  * `addReferenceObj`), so the plan serializes to real executors — no
  * driver-local registry. MinHashSigSpec pins the expression to the
  * declarative chain; IncrementalDedupSpec and the oracle gate re-pin
  * every consumer.
  */
case class MinHashSigExpr(
    child: Expression, as: Seq[Long], bs: Seq[Long], p: Long)
    extends UnaryExpression {

  @transient private lazy val cfg =
    new MinHashSigExpr.Cfg(as.toArray, bs.toArray, p)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], cfg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cfgRef = ctx.addReferenceObj("minhashCfg", cfg,
      classOf[MinHashSigExpr.Cfg].getName)
    defineCodeGen(ctx, ev,
      a => s"graft.functions.MinHashSigExpr.compute($a, $cfgRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {

  final class Cfg(val as: Array[Long], val bs: Array[Long], val p: Long)
    extends Serializable

  /** Column form: the K per-permutation minima of a shingle array. */
  def sig(sarr: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    Shims.column(MinHashSigExpr(Shims.expression(sarr), as, bs, p))

  def compute(sarr: ArrayData, cfg: Cfg): GenericArrayData = {
    val k = cfg.as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = sarr.numElements()
    var i = 0
    while (i < n) {
      val x = Md5Hash60Expr.compute(sarr.getUTF8String(i)) % cfg.p
      var j = 0
      while (j < k) {
        val v = (cfg.as(j) * x + cfg.bs(j)) % cfg.p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }
}
