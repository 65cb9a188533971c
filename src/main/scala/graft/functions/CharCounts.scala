package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass character-class counter: returns `[n_digits, n_punct]`
  * for a string, where n_digits counts `[0-9]` and n_punct counts code
  * points NOT in `[a-zA-Z0-9 ]` — value-identical to the portable
  * two-regex form
  * `length(regexp_replace(x, '[^0-9]', ''))` /
  * `length(regexp_replace(x, '[a-zA-Z0-9 ]', ''))`
  * that the DuckDB oracle keeps using, minus two full regex passes and
  * two intermediate strings per row. One byte loop; code points are
  * counted via UTF-8 leading bytes, so multi-byte chars count once
  * (matching both engines' code-point `length`). */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_counts expects string, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_char_counts"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharCountsKernel.compute(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.CharCountsKernel.compute($c.getBytes()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {
  def apply(c: Column): Column =
    GraftBridge.column(CharCounts(GraftBridge.expression(c)))
}

object CharCountsKernel {
  /** [digits, punct] in one pass over UTF-8 bytes. ASCII classes are
    * single-byte; a code point is counted once via its leading byte. */
  def compute(s: Array[Byte]): Array[Long] = {
    var digits = 0L
    var alnumSpace = 0L
    var chars = 0L
    var i = 0
    while (i < s.length) {
      val b = s(i)
      if ((b & 0xc0) != 0x80) chars += 1
      if (b >= '0' && b <= '9') { digits += 1; alnumSpace += 1 }
      else if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == ' ')
        alnumSpace += 1
      i += 1
    }
    Array(digits, chars - alnumSpace)
  }
}
