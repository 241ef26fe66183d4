package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a NATIVE aggregate — the scale-correct
  * replacement for the `row_number() OVER (PARTITION BY …) <= k` window
  * pattern. The window form SORTS every group's full row set (shuffle all
  * rows, sort, keep k); this aggregate keeps a k-bounded buffer per group
  * with map-side PARTIAL aggregation, so each mapper ships at most k rows
  * per group into the exchange and the reduce side merges k-vs-k lists.
  * At 10⁹ orders / 10⁷ customers with k=3 that is the difference between
  * shuffling 10⁹ rows and shuffling ≤ 3·mappers·10⁷ — and no per-group
  * sort ever materializes.
  *
  * Ordering: `ord` DESC, then `payload` ASC (the deterministic tie-break
  * every driver-contract query uses). `payload` is BIGINT; `ord` is BIGINT
  * (exact integer keys — cents, epoch millis, ids) or DOUBLE (the cosine
  * ranking path). Double ords are held in the buffer as order-preserving
  * "sortable bits" (sign-flip transform of `doubleToLongBits`), so the
  * buffer/serialization stays two longs per entry and the long comparison
  * reproduces the exact `Double.compare` total order (-0.0 < 0.0, NaN
  * greatest — the same order Spark's SortOrder uses for DOUBLE).
  */
case class TopKPairs(
    ord: Expression,
    payload: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  /** k is a literal at plan time (foldable), bounded for sanity. */
  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"top_k_pairs: k must be an integer literal, got $other")
    }
    require(v > 0 && v <= (1 << 20), s"top_k_pairs: k out of range: $v")
    v
  }

  /** Whether the ord operand is DOUBLE (else BIGINT). Fixed at plan time. */
  private lazy val ordIsDouble: Boolean = ord.dataType == DoubleType

  /** Self-inverse order-preserving double-bits transform: flips the
    * non-sign bits of negative-signed bit patterns so signed-long order
    * equals `Double.compare` order. */
  @inline private def sortableBits(x: Long): Long =
    x ^ ((x >> 63) & 0x7FFFFFFFFFFFFFFFL)

  override def checkInputDataTypes(): TypeCheckResult =
    if ((ord.dataType == LongType || ord.dataType == DoubleType) &&
        payload.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_pairs: ord must be BIGINT or DOUBLE and payload BIGINT, " +
        s"got (${ord.dataType.simpleString}, ${payload.dataType.simpleString})")

  override def children: Seq[Expression] = Seq(ord, payload, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", ord.dataType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](k + 1)

  /** true iff a ranks strictly before b (ord DESC, payload ASC). */
  @inline private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sorted insert capped at k (linear — k is small; the buffer stays
    * sorted so merge/eval need no extra sort). */
  private def insert(buf: ArrayBuffer[(Long, Long)],
      e: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    if (buf.length == k && !before(e, buf.last)) return buf
    var i = buf.length
    while (i > 0 && before(e, buf(i - 1))) i -= 1
    buf.insert(i, e)
    if (buf.length > k) buf.remove(buf.length - 1)
    buf
  }

  override def update(buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o == null || p == null) buf
    else {
      val oBits =
        if (ordIsDouble)
          sortableBits(java.lang.Double.doubleToLongBits(
            o.asInstanceOf[Double]))
        else o.asInstanceOf[Long]
      insert(buf, (oBits, p.asInstanceOf[Long]))
    }
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
      other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any =
    new GenericArrayData(buf.map { case (o, p) =>
      val ordOut: Any =
        if (ordIsDouble) java.lang.Double.longBitsToDouble(sortableBits(o))
        else o
      InternalRow(ordOut, p)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (o, p) => bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](math.max(n, k) + 1)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ord = newChildren(0), payload = newChildren(1),
      kExpr = newChildren(2))
}

object TopKAgg {
  import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}

  /** Column API: `array<struct<ord, payload>>` of the group's top k by
    * (ord DESC, payload ASC). */
  def top_k_pairs(ord: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKPairs(
        ExpressionUtils.expression(ord),
        ExpressionUtils.expression(payload),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
