package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumns
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd Bloom-filter membership probe over a `bigint`
  * column — the broadcast prefilter for decontamination-style
  * "is this key in the (bounded) reference set?" operators.
  *
  * Spark ships `BloomFilterMightContain` internally for runtime join
  * filtering but does not expose it as a public function; this is the
  * same idea surfaced as a library expression. The filter object is
  * attached to the expression and travels to executors with the
  * serialized plan (BloomFilterImpl is `java.io.Serializable`); codegen
  * pins it once via `addReferenceObj`, so the hot loop is a single
  * virtual call on a shared immutable bitset — no boxing, no UDF, and
  * the surrounding WholeStageCodegen span stays intact.
  *
  * Correctness contract: a Bloom filter has NO false negatives, so a
  * `mightContain` prefilter followed by an exact confirm join returns
  * the exact answer for ANY filter contents — an undersized filter
  * degrades the prefilter's selectivity (more rows survive to the
  * confirm join), never the result. That graceful-degradation shape is
  * the point: the scale failure mode is "slower", not "wrong" or "OOM".
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  /** `bloom.mightContainLong(col)` as a Column predicate. */
  def mightContainLong(c: Column, bloom: BloomFilter): Column =
    GraftColumns.column(BloomMightContainLong(GraftColumns.expression(c), bloom))
}
