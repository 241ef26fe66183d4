package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, expr}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: minimum polynomial rolling hash over all
  * byte windows of length [[RollingHash.Window]] (winnowing-style content
  * fingerprint — robust to edits outside any single window).
  *
  * A native Catalyst `Expression` with `doGenCode` (not a Scala UDF), so it
  * stays inside whole-stage codegen: one O(n) pass per document with no
  * boxing, which is what a 100 TB fingerprinting pass needs.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingHash.minWindowHash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.minWindowHash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Window length in bytes. */
  val Window = 16
  /** Polynomial base (odd, wrap-around multiplication). */
  val Base = 1099511628211L
  private val BasePowW: Long = {
    var p = 1L
    var i = 0
    while (i < Window) { p *= Base; i += 1 }
    p
  }

  /** Min over rolling-window polynomial hashes; whole-string hash if the
    * input is shorter than one window. Called from generated code. */
  def minWindowHash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    if (n <= Window) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      return h
    }
    var h = 0L
    var i = 0
    while (i < Window) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = h * Base + (bytes(i) & 0xff) - BasePowW * (bytes(i - Window) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Register as a SQL function on the session (idempotent). Arity-guarded
    * exactly like the GraftExtensions injection — this registration
    * REPLACES the extension one when both run in a session, so a lenient
    * builder here would silently swallow extra arguments. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      exprs => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`rolling_hash`",
              "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        RollingHash(exprs.head)
      }, "built-in")

  /** Column API (registry-free). */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      RollingHash(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
