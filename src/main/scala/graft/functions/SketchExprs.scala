package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions over sketch objects. Spark's own
  * `BloomFilterMightContain` is internal API (used by its runtime join
  * pruning), so the public-API route to a codegen'd probe is this tiny
  * expression: the filter rides the plan as a codegen reference object
  * (the stage's task binary is itself torrent-broadcast, so executors
  * receive it once per stage, like the former explicit broadcast), and
  * the probe emits as ONE virtual call inside whole-stage codegen —
  * unlike a Scala UDF, which forces an eval fence (boxing + encoder
  * round-trip) in the middle of the probe-side scan stage. */
object SketchExprs {
  def bloomMightContain(key: Column, bloom: BloomFilter): Column =
    ExpressionUtils.column(
      BloomMightContainLong(ExpressionUtils.expression(key), bloom))
}

/** `bloom.mightContainLong(child)` with `doGenCode` — keeps the
  * fact-side probe scan fused in whole-stage codegen. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects a bigint key")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any): Any =
    bloom.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
