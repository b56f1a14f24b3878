package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two `array<float>` (or
  * `array<double>`) columns.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order form in the
  * similarity hot paths: HOFs are CodegenFallback — each evaluation
  * binds lambda variables and materializes a boxed intermediate array
  * per row (~130 boxed doubles per 64-dim pair), interpreted inside
  * the surrounding WholeStageCodegen. This expression generates a
  * primitive loop instead: zero allocation, full codegen, and the
  * identical left-associated IEEE summation order
  * (`acc += (double)a[i] * (double)b[i]` from 0.0) — so the DuckDB
  * oracle's explicit term chains stay bit-exact.
  *
  * Norms need no second expression: ‖a‖² ≡ dot(a, a), same fold.
  *
  * Null semantics match the HOF form on well-formed data (null array
  * → null result); arrays are folded over the common prefix length. */
case class DotProductF(left: Expression, right: Expression)
  extends BinaryExpression {

  // Each side independently accepts float or double elements (the
  // 768-dim production gates build array<double> vectors; the base
  // embeddings table stores array<float>). Element access is resolved
  // per side at PLAN time, so the generated loop stays monomorphic —
  // no per-element branch, same left-associated double fold either
  // way.
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  private def isDouble(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = isDouble(left.dataType)
    val rd = isDouble(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      def get(arr: String, dt: DataType): String =
        if (isDouble(dt)) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd equal-element count over two `array<bigint>`
  * columns — the MinHash signature-agreement kernel, evaluated once
  * per candidate PAIR in the LSH self-join (the hottest non-scan loop
  * in the dedup family). Replaces an interpreted
  * `aggregate(zip_with(.., IF(x=y,1,0)), ..)` fold; identical 0..n
  * integer count over the common prefix length. */
case class MatchCountF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Σ aᵢ·bᵢ as a codegen'd primitive loop (left-associated from 0.0). */
  def dotF(a: Column, b: Column): Column =
    GraftColumns.column(DotProductF(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** #{i : aᵢ = bᵢ} as a codegen'd primitive loop. */
  def matchCountF(a: Column, b: Column): Column =
    GraftColumns.column(MatchCountF(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Makes the kernels SQL-callable (`graft_dot`, `graft_match_count`)
    * in an existing session. For sessions you build yourself, the
    * SparkSessionExtensions route is [[GraftExtensions]] via
    * `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftColumns.registerFunction(spark, "graft_dot",
      "graft_dot(a, b) - dot product of two float arrays as double",
      exprs => DotProductF(exprs(0), exprs(1)))
    GraftColumns.registerFunction(spark, "graft_match_count",
      "graft_match_count(a, b) - count of positions where two bigint arrays agree",
      exprs => MatchCountF(exprs(0), exprs(1)))
  }
}

/** Session-build-time injection: set
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * (SURVEY §2.12 extension surface — same mechanism a SQL-only
  * deployment would use; no private API involved). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions", "graft_dot",
        "graft_dot(a, b) - dot product of two float arrays as double"),
      (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_match_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions", "graft_match_count",
        "graft_match_count(a, b) - count of positions where two bigint arrays agree"),
      (exprs: Seq[Expression]) => MatchCountF(exprs(0), exprs(1))))
  }
}
