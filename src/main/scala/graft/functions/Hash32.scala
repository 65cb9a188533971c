package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft's 32-bit string hash as a native kernel: the first 4 bytes of
  * md5(s), big-endian unsigned — value-identical to the portable SQL
  * form `conv(substr(md5(s), 1, 8), 16, 10)` that the DuckDB oracles
  * keep using, minus the hex round-trip. */
case class Hash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash32 expects string, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_hash32"

  override def nullSafeEval(input: Any): Any =
    Hash32Kernel.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash32Kernel.compute($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Hash32 =
    copy(child = newChild)
}

object Hash32 {
  def apply(c: Column): Column =
    GraftBridge.column(Hash32(GraftBridge.expression(c)))
}

object Hash32Kernel {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val dig = md.digest(s)
    ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
      ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
  }
}
