package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer squared-L2 distance between a float-array embedding and a
  * pre-quantized bigint-array center: each float component quantizes to
  * [[QSqDistImpl.Q]] fixed-point (round HALF AWAY FROM ZERO — the
  * `round()` semantics Spark and DuckDB share, the d4_prune contract)
  * and the squared difference accumulates in one fused long loop inside
  * whole-stage codegen. All-integer, so the distance — and every
  * argmin/argmax built on it — is bit-reproducible across engines,
  * re-runs, and partition orders (a float distance summed in different
  * index orders differs in ULPs). */
object QSqDistImpl {
  /** Fixed-point scale (mirrors Similarity.ProtoQ — one source). */
  val Q = 1000L

  /** round-half-away-from-zero of x·Q — both engines' `round()`. */
  def quant(x: Double): Long = {
    val v = x * Q
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong
  }

  def sqdist(a: ArrayData, c: ArrayData): Long = {
    val n = math.min(a.numElements(), c.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = quant(a.getFloat(i).toDouble) - c.getLong(i)
      s += d * d
      i += 1
    }
    s
  }
}

case class QSqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    QSqDistImpl.sqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.QSqDistImpl.sqdist($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSqDist =
    copy(left = newLeft, right = newRight)
}

object QSqDist {
  import org.apache.spark.sql.GraftColumnBridge

  def q_sqdist(a: Column, b: Column): Column =
    GraftColumnBridge.column(QSqDist(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
