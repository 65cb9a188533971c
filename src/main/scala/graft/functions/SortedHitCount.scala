package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** How many elements of `probe` appear in the SORTED array `sorted` —
  * `size(array_intersect(probe, sorted))` for a distinct probe, but by
  * per-element binary search instead of a hash-set build.
  *
  * Exists because Spark's ArrayIntersect rebuilds its lookup set from
  * scratch ON EVERY ROW: probing a ~30k-gram broadcast benchmark array
  * that way costs |bench| hash inserts per corpus row (measured: 60%
  * of d43's runtime). Binary search costs |probe|·log|bench| with zero
  * allocation, and stays inside whole-stage codegen via the static
  * kernel call.
  *
  * CONTRACT: `sorted` must be ascending under UTF8String's binary
  * ordering — exactly what `array_sort` produces for strings; the
  * caller owns that (d43 sorts at the collect_set aggregate). The
  * probe side need not be sorted; it should be distinct if the result
  * is to be read as an intersection size. */
case class SortedHitCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_sorted_hit_count expects (array<string>, array<string>), got (${l.simpleString}, ${r.simpleString})")
    }

  override def prettyName: String = "graft_sorted_hit_count"

  override def nullSafeEval(probe: Any, sorted: Any): Any =
    SortedHitCountKernel.count(
      probe.asInstanceOf[ArrayData], sorted.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, s) => s"""
      |${ev.value} = graft.functions.SortedHitCountKernel.count($p, $s);
    """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedHitCount =
    copy(left = newLeft, right = newRight)
}

object SortedHitCount {
  def apply(probe: Column, sorted: Column): Column =
    GraftBridge.column(
      SortedHitCount(GraftBridge.expression(probe), GraftBridge.expression(sorted)))
}

object SortedHitCountKernel {
  /** NON-NULL elements of `probe` found in ascending-sorted `sorted`
    * (null probe elements never match, null sorted elements never
    * matched against — defined semantics for the registered SQL form;
    * graft-internal gram arrays never hold nulls, and array_sort puts
    * nulls LAST so the non-null prefix the search runs over stays
    * sorted). */
  def count(probe: ArrayData, sorted: ArrayData): Long = {
    var m = sorted.numElements()
    while (m > 0 && sorted.isNullAt(m - 1)) m -= 1 // drop array_sort's null tail
    val n = probe.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (probe.isNullAt(i)) { i += 1 }
      else {
      val g = probe.getUTF8String(i)
      var lo = 0
      var hi = m - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = sorted.getUTF8String(mid).compareTo(g)
        if (c == 0) { hits += 1; lo = hi + 2 } // found: exit (distinct sorted set)
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      i += 1
      }
    }
    hits
  }
}
