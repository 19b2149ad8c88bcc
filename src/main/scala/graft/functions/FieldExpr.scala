package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL `FIELD(str, v1, v2, ...)` as a native Catalyst expression with
  * whole-stage codegen: returns the 1-based position of `str` among the
  * candidates, 0 if absent, 0 if `str` is NULL (MySQL semantics — never
  * NULL, so it is safe as a sort key).
  *
  * The reference's Qc orders weekdays with
  * `ORDER BY FIELD(weekday,'Monday',...,'Sunday')`
  * (ref: sql/analysis_queries.sql:33-35); Spark has no FIELD, so this
  * expression restores SQL-text parity (SURVEY.md §7.3). Built-in
  * `array_position` is the composition fallback; this exists so the
  * original MySQL text runs unchanged and stays codegen'd.
  */
case class FieldExpr(children: Seq[Expression])
    extends Expression {

  require(children.nonEmpty, "FIELD() requires at least the search argument")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val target = children.head.eval(input)
    if (target == null) 0L
    else {
      var i = 1
      while (i < children.length) {
        val v = children(i).eval(input)
        if (v != null && v.asInstanceOf[UTF8String].equals(target)) {
          return i.toLong
        }
        i += 1
      }
      0L
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val targetGen = children.head.genCode(ctx)
    val candGens = children.tail.map(_.genCode(ctx))
    val matches = candGens.zipWithIndex.map { case (c, idx) =>
      s"""
         |if (${ev.value} == 0L) {
         |  ${c.code}
         |  if (!${c.isNull} && ${c.value}.equals(${targetGen.value})) {
         |    ${ev.value} = ${idx + 1}L;
         |  }
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |${targetGen.code}
        |long ${ev.value} = 0L;
        |if (!${targetGen.isNull}) {
        |  $matches
        |}
       """.stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object FieldExpr {

  /** All arguments are coerced to string before comparison. This matches
    * MySQL FIELD for string arguments (the reference's only use — weekday
    * names); it intentionally diverges from MySQL's all-numeric mode,
    * where arguments are compared numerically (FIELD(2, 10, 2.0) = 2 in
    * MySQL, 0 here since '2' <> '2.0'). Unconditional cast because
    * children may be unresolved (no dataType yet); SimplifyCasts removes
    * the no-op string→string.
    */
  private def asStrings(exprs: Seq[Expression]): Seq[Expression] =
    exprs.map(e => org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.StringType))

  /** Registry-builder form with MySQL string coercion applied. */
  def withStringCoercion(exprs: Seq[Expression]): FieldExpr =
    FieldExpr(asStrings(exprs))

  /** Column-API form: `field($"weekday", "Monday", ..., "Sunday")`. */
  def field(str: Column, candidates: String*): Column = {
    import org.apache.spark.sql.functions.lit
    Shims.column(FieldExpr(asStrings(
      Shims.expression(str) +:
        candidates.map(c => Shims.expression(lit(c))))))
  }

  /** Registers `field`, `dayname`, and `%`-pattern `date_format` so the
    * reference's original MySQL query text runs through `spark.sql`
    * unchanged.
    */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{DateFormatClass, Literal}
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "field", exprs => FieldExpr(asStrings(exprs)), "scala_udf")
    // DAYNAME(d) -> date_format(d, 'EEEE'). Spark 4 ships a builtin
    // `dayname` returning the abbreviated name ('Fri'); MySQL returns the
    // full name (ref: sql/analysis_queries.sql:27), so shadow it with a
    // temp function built on DateFormatClass.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dayname",
      exprs => DateFormatClass(exprs.head, Literal("EEEE")),
      "scala_udf")
    // DATE_FORMAT(d, '%Y-%m') -> date_format(d, 'yyyy-MM'): MySQL shares
    // Spark's function name but speaks %-specifiers
    // (ref: sql/analysis_queries.sql:47). Hybrid shadow: a foldable
    // %-bearing format literal is translated at plan-build time
    // (MySqlFormat), everything else passes through, so Spark-pattern
    // callers are unaffected and the hot path stays the same codegen'd
    // DateFormatClass either way.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "date_format",
      exprs => {
        val fmt = exprs(1) match {
          case Literal(s: UTF8String, org.apache.spark.sql.types.StringType)
              if s.toString.contains("%") =>
            Literal(UTF8String.fromString(MySqlFormat.toJavaPattern(s.toString)),
              org.apache.spark.sql.types.StringType)
          case other => other
        }
        DateFormatClass(exprs.head, fmt)
      },
      "scala_udf")
  }
}
