package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Morton (Z-order) key: interleaves the low 32 bits of two
  * non-negative longs, bit i of `left` → bit 2i, bit i of `right` →
  * bit 2i+1.
  *
  * Sorting a table by this key clusters BOTH dimensions at once:
  * points close in (x, y) land in the same parquet row groups, so
  * min/max statistics prune scans for predicates on either column —
  * where a plain sort only ever skips on its leading column. At 100 TB
  * this is the difference between "fast queries on ts" and "fast
  * queries on ts AND user". Inputs must be pre-normalized to
  * non-negative ints of comparable magnitude (rank, bucket, or
  * truncated epoch) — interleaving raw values of wildly different
  * scales wastes the high bits. Codegen: one call to the static
  * spread-bits kernel, no boxing.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 needs (bigint, bigint), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder64.zorder(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder64.zorder($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object ZOrder64 {

  /** Spread the low 32 bits of x to even bit positions (Morton magic
    * numbers). */
  def spread(x: Long): Long = {
    var v = x & 0xffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def zorder(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column-world handle. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
