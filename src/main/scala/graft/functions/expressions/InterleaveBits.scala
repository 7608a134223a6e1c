package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `interleave_bits(x, y)` — Morton (Z-order) interleave of the low 16 bits
  * of two non-negative integer keys: bit i of `x` lands at position 2i, bit i
  * of `y` at position 2i+1. Sorting or range-bucketing by the result clusters
  * rows that are close in BOTH dimensions into the same file/partition, so a
  * scan filtered on either key prunes most buckets — the standard multi-dim
  * data-layout trick for 100 TB tables where queries filter on more than one
  * column (a single-column sort only prunes for its own column).
  *
  * Native Catalyst expression with whole-stage codegen (tier (b) of
  * SURVEY.md §7.3): `doGenCode` emits two branch-free shift-mask spreads —
  * no UDF boxing, stays inside the enclosing codegen stage.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.InterleaveBits.morton16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Spread the low 16 bits of `v` to even positions (0,2,…,30). */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 16+16 → 32-bit Morton code. Called from generated code — keep static. */
  def morton16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Column-API form (registers on first use in the active session). */
  def interleaveBits(x: Column, y: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("interleave_bits", x, y)
  }

  /** Register in a session's function registry so `spark.sql` and
    * `expr("interleave_bits(x, y)")` resolve it.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "interleave_bits", exprs => InterleaveBits(exprs(0), exprs(1)), "built-in")
}
