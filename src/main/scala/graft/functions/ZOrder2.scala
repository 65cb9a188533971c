package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 2-D Z-order (Morton) key as a native codegen kernel: interleaves the
  * low 16 bits of two longs (x on even bit positions, y on odd), giving
  * a 32-bit locality-preserving sort key.
  *
  * The point at 100 TB is DATA LAYOUT: sorting/range-partitioning a
  * corpus by `graft_zorder(dim_a, dim_b)` co-locates rows that are
  * close in BOTH dimensions, so later scans filtering on either (or
  * both) prune most files via min/max statistics — the multi-column
  * generalization of sorting by one column (the clustering scheme
  * Delta/Iceberg expose as `ZORDER BY`/sort orders).
  *
  * The bit spread uses the parallel-prefix mask cascade (5 shift-mask
  * steps per operand, branch-free) rather than a 16-iteration bit
  * loop; the portable HOF/SQL twin the oracle uses is the per-bit sum
  * `Σ_j ((x>>j)&1)·4^j + ((y>>j)&1)·2·4^j` — FunctionsSpec pins kernel
  * ≡ HOF on randomized inputs.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_zorder expects (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2Kernel.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder2Kernel.interleave($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def apply(x: Column, y: Column): Column =
    GraftBridge.column(ZOrder2(GraftBridge.expression(x), GraftBridge.expression(y)))
}

object ZOrder2Kernel {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * value (0bABCD -> 0b0A0B0C0D) via the parallel-prefix mask cascade. */
  def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)
}
