package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter over 64-bit keys —
  * the sketch-side half of incremental corpus dedup (see
  * [[graft.exts.Dedup.incrementalNew]]).
  *
  * The filter is built once from the at-rest corpus (an index artifact,
  * like the IVF centroids) and shipped to executors inside the expression
  * via the codegen reference table, so the probe runs inside whole-stage
  * codegen: one hash + a few bit tests per row, no join, no shuffle. A
  * Bloom filter has NO false negatives for inserted keys, so a `false`
  * here is a definite "not in corpus" — only the `true` rows (real dups +
  * the configured false-positive fraction) need the exact verification
  * join. This is the same runtime-filter design Spark's own
  * injectRuntimeFilter uses for join pruning, expressed as a reusable
  * standalone expression.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomFilterExpr {
  import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}

  /** Column API: true iff `key` (bigint) might be in `bloom`. */
  def bloom_might_contain(bloom: BloomFilter, key: Column): Column =
    ExpressionUtils.column(
      BloomMightContain(ExpressionUtils.expression(key), bloom))
}
