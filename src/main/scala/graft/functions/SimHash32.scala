package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash over a word array in ONE per-row pass.
  *
  * Bit b of the fingerprint is set iff Σ over words of
  * (bit b of hash32(w) set ? +1 : −1) > 0 — value-identical to the
  * relational formulation the DuckDB oracle uses (explode → distinct →
  * 32 conditional sums → bit recombination), but with no explode and
  * no shuffle: the caller passes the per-row distinct word set
  * (`array_distinct(ws)`) and the sign accumulation is order-independent.
  * Turns the fingerprint build from two shuffles over |words| rows into
  * an embarrassingly parallel projection. Input arrays must not contain
  * null elements (guaranteed by `split`). */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash32 expects array<string>, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_simhash32"

  /** Null-element skipping is only paid when the input ArrayType can
    * hold null elements (`split` yields containsNull=false, so graft's
    * own fingerprint path runs guard-free; arbitrary SQL callers keep
    * the defined skip-null behavior). */
  @transient private[graft] lazy val mayContainNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any =
    SimHash32Kernel.compute(input.asInstanceOf[ArrayData], mayContainNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash32Kernel.compute($c, $mayContainNullElems);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def apply(c: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(c)))
}

object SimHash32Kernel {
  def compute(words: ArrayData, guarded: Boolean): Long = {
    val cnt = new Array[Int](32)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      // skip null elements only when the static type allows them:
      // graft_simhash32 is a public SQL function, so arbitrary arrays
      // must not NPE the task — but typed-non-null inputs skip the branch
      if (!guarded || !words.isNullAt(i)) {
        val h = Hash32Kernel.compute(words.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          if (((h >> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (cnt(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}
