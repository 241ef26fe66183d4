package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) curve value for two integer dimensions: interleaves
  * the low 32 bits of each input into one 64-bit key. Ordering by the
  * z-value clusters rows that are close in BOTH dimensions, so a rewrite
  * sorted by it yields files whose min/max ranges are tight on every
  * participating column — multi-column file pruning, where a plain sort
  * only prunes on its leading column. Native expression with codegen, like
  * the other graft functions.
  */
object ZOrderImpl {
  /** Bit-interleave (a even positions, b odd). Magic-number spread:
    * O(log w) instead of a 32-step loop per row. */
  def interleave(a: Int, b: Int): Long =
    spread(a) | (spread(b) << 1)

  private def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}

/** z-value of two int columns: `z_order2(a, b)` — bigint. Declares
  * `int` inputs so narrower integrals coerce and wider/non-integral
  * arguments fail at analysis time, not with a cast error mid-job. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // Seq is covariant: Seq[DataType] satisfies Seq[AbstractDataType]
  // without naming the private[sql] AbstractDataType.
  override def inputTypes: Seq[DataType] = Seq(IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderImpl.interleave($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  import org.apache.spark.sql.GraftColumnBridge

  def z_order2(a: Column, b: Column): Column =
    GraftColumnBridge.column(ZOrder2(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
