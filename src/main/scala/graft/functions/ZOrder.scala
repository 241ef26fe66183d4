package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, NullType, ShortType}

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

/** z-value of two int columns: `z_order2(a, b)` — bigint. Accepts 32-bit
  * and narrower integrals only; wider or non-integral arguments fail at
  * analysis time (implicit numeric casts would otherwise silently
  * value-truncate a bigint/double to its low 32 bits — a caller who means
  * that writes the cast explicitly, as [[graft.engine.Compact]] does
  * after range-normalizing to 16 bits). */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType is allowed: the expression is null-intolerant, so an untyped
    // null literal just yields null — no value truncation is possible.
    val bad = Seq(left, right).map(_.dataType).filterNot {
      case ByteType | ShortType | IntegerType | NullType => true
      case _ => false
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "z_order2 requires int-or-narrower integral arguments, got (" +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString})" +
        "; cast explicitly if low-32-bit truncation is intended")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Number].intValue,
      b.asInstanceOf[Number].intValue)
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
