package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** EXACT membership probe against a broadcast sorted long array — the
  * exact sibling of [[BloomMightContain]] for boundary sets small enough
  * to ship whole (an eval benchmark's span hashes: 10⁴-10⁶ longs = a few
  * MB, broadcast-dim-table scale). One binary search per probe inside
  * whole-stage codegen: no join, no shuffle, and crucially NO STATE —
  * which is what lets a streaming stage apply a set boundary statelessly
  * inside a single declarative query (see
  * [[graft.exts.TextAnalysis.scrubAgainstSet]]). Where the set outgrows
  * the broadcast budget, [[BloomMightContain]] is the sketch fallback
  * (false positives over-apply the boundary at the configured fpp). */
case class LongSetContains(child: Expression, sorted: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(sorted, input.asInstanceOf[Long]) >= 0
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedSet", sorted, "long[]")
    defineCodeGen(ctx, ev,
      c => s"(java.util.Arrays.binarySearch($ref, $c) >= 0)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): LongSetContains =
    copy(child = newChild)
}

object SetExpr {
  import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}

  /** Column API: true iff `key` (bigint) is in the SORTED array. */
  def long_set_contains(sorted: Array[Long], key: Column): Column =
    ExpressionUtils.column(
      LongSetContains(ExpressionUtils.expression(key), sorted))
}
