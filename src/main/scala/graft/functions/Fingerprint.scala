package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass winnowing fingerprint: returns `[fp_min, n_uniq]` over
  * the stride-4 8-char windows of a string — fp_min is the minimum
  * [[Hash32Kernel]] value (md5-derived, oracle-portable) across the
  * windows, n_uniq the count of DISTINCT window strings.
  *
  * Value-identical to the explode formulation
  * `explode(sequence(1, length(s)-7, 4)) → substr(s, i, 8) →
  * groupBy(min(hash32), countDistinct)` that the DuckDB oracle keeps
  * using — but as a per-row projection AT THE SCAN: the explode form
  * fans every document out to |windows| rows and pushes them through a
  * per-doc aggregation exchange, which at 100 TB multiplies the
  * dominant shuffle by the window count (~len/4). Windows are indexed
  * by CODE POINT (UTF8String.substringSQL semantics), so the kernel
  * matches `substr` on any input, not just the ASCII normalized text.
  *
  * Strings shorter than 8 code points have no windows: `[-1, 0]`
  * (d11 filters those rows out before the kernel; the sentinel keeps
  * the public SQL function total). */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      FingerprintKernel.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.FingerprintKernel.compute($c));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  def apply(c: Column): Column =
    GraftBridge.column(Fingerprint(GraftBridge.expression(c)))
}

object FingerprintKernel {
  def compute(s: UTF8String): Array[Long] = {
    val n = s.numChars()
    if (n < 8) return Array(-1L, 0L)
    var fpMin = Long.MaxValue
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= n - 8) {
      val w = s.substringSQL(i + 1, 8) // 1-based, code-point indexed
      val h = Hash32Kernel.compute(w.getBytes)
      if (h < fpMin) fpMin = h
      seen.add(w)
      i += 4
    }
    Array(fpMin, seen.size.toLong)
  }
}
