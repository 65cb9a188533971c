package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass lexical-diversity kernel (x09): returns
  * `[n_types, n_hapax, sum(c²)]` for a word array — the per-doc
  * statistics d107/s43's panel derives TTR, hapax fraction and the
  * Simpson repeat probability from.
  *
  * Value-identical to the portable sorted-run `aggregate` HOF fold the
  * operator originally shipped (sort the array, run-length scan, charge
  * each run's count² once) — FunctionsSpec pins the equivalence on the
  * corpus plus adversarial edge rows. The difference is the execution
  * path: a higher-order function interprets its lambda per ELEMENT
  * (closure dispatch + boxed struct state per word), while this kernel
  * is one `Arrays.sort` over the row's UTF8String pointers and a tight
  * primitive loop, invoked once per row from inside whole-stage
  * codegen. Null ELEMENTS are skipped deterministically (a null word
  * is not a type, not a hapax, and contributes no repeat mass) — the
  * `split` output both callers feed it never produces one, but the
  * registered SQL function is callable on any array<string>, so the
  * kernel must not NPE on `array('a', NULL)`.
  *
  * Binary UTF8String ordering groups equal words exactly like the
  * HOF's `array_sort` + `=` (only equality-grouping matters for the
  * counts, and both orders are total with the same equality). */
case class DiversityStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_diversity_stats expects array<string>, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_diversity_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      DiversityStatsKernel.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.DiversityStatsKernel.compute($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): DiversityStats =
    copy(child = newChild)
}

object DiversityStats {
  def apply(c: Column): Column =
    GraftBridge.column(DiversityStats(GraftBridge.expression(c)))
}

object DiversityStatsKernel {
  /** [n_types, n_hapax, Σc²] in one sort + one run-length pass.
    * Null elements are dropped before the sort (they would NPE
    * UTF8String.compareTo) — an all-null or empty array yields
    * [0, 0, 0]. */
  def compute(arr: ArrayData): Array[Long] = {
    val total = arr.numElements()
    val a = new Array[UTF8String](total)
    var n = 0
    var j = 0
    while (j < total) {
      if (!arr.isNullAt(j)) { a(n) = arr.getUTF8String(j); n += 1 }
      j += 1
    }
    java.util.Arrays.sort(a.asInstanceOf[Array[AnyRef]], 0, n)
    var i = 0
    var types = 0L
    var hapax = 0L
    var sumsq = 0L
    var run = 0L
    var prev: UTF8String = null
    i = 0
    while (i < n) {
      val w = a(i)
      if (prev != null && w.equals(prev)) {
        run += 1L
      } else {
        types += 1L
        if (run == 1L) hapax += 1L
        sumsq += run * run
        prev = w
        run = 1L
      }
      i += 1
    }
    if (run == 1L) hapax += 1L
    sumsq += run * run
    Array(types, hapax, sumsq)
  }
}
