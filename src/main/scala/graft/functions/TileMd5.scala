package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** md5 hex of every w-word tile of a word array at a fixed stride, in
  * position order: tile t covers words [t·stride, t·stride + w), count
  * = floor((n − w)/stride) + 1 (empty below w words).
  *
  * Value-identical to the HOF formulations it replaces —
  * `transform(sequence(0, size(ws) div 8 - 1), i ->
  * md5(concat_ws(' ', slice(ws, i*8+1, 8))))` (stride = w = 8, the
  * d36/d90/s10 non-overlapping tile unit) and
  * `transform(sequence(0, size(ws) - 8), i ->
  * md5(concat_ws(' ', slice(ws, i+1, 8))))` (stride = 1, d111's
  * winnowing rolling hashes) — both were CodegenFallback: per tile an
  * interpreted lambda allocated the slice array, concatenated it to a
  * string, and only then hashed. This feeds the digest incrementally
  * (word bytes + separator), allocating nothing but the 32-char hex
  * output, inside whole-stage codegen. The stride-1 form hashes per
  * WORD position, so it is the hottest text-side loop the winnowing
  * operator runs. Null words are skipped (concat_ws semantics; graft's
  * split output never holds them). */
case class TileMd5(child: Expression, w: Int, stride: Int)
    extends UnaryExpression {
  require(w >= 1 && stride >= 1, s"w and stride must be >= 1, got ($w, $stride)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tile_md5 expects array<string>, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_tile_md5"

  @transient private[graft] lazy val mayContainNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any =
    TileMd5Kernel.compute(
      input.asInstanceOf[ArrayData], w, stride, mayContainNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TileMd5Kernel.compute($c, $w, $stride, $mayContainNullElems);")

  override protected def withNewChildInternal(newChild: Expression): TileMd5 =
    copy(child = newChild)
}

object TileMd5 {
  def apply(c: Column, w: Int, stride: Int): Column =
    GraftBridge.column(TileMd5(GraftBridge.expression(c), w, stride))
}

object TileMd5Kernel {
  private val Empty = new GenericArrayData(Array.empty[Any])
  private val Space = " ".getBytes("UTF-8")
  private val HexChars = "0123456789abcdef".getBytes("UTF-8")

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Lowercase hex of a 16-byte digest — what Spark's and DuckDB's
    * `md5()` both print. */
  private def hex(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((dig(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(dig(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(ws: ArrayData, w: Int, stride: Int, guarded: Boolean): ArrayData = {
    val n = ws.numElements()
    if (n < w) return Empty
    val m = (n - w) / stride + 1
    val out = new Array[AnyRef](m)
    val md = digests.get()
    var t = 0
    while (t < m) {
      val start = t * stride
      md.reset()
      // concat_ws(' ', …) parity: single separator between NON-NULL
      // words, nulls skipped entirely
      var first = true
      var j = 0
      while (j < w) {
        if (!guarded || !ws.isNullAt(start + j)) {
          if (!first) md.update(Space)
          first = false
          md.update(ws.getUTF8String(start + j).getBytes)
        }
        j += 1
      }
      out(t) = hex(md.digest())
      t += 1
    }
    new GenericArrayData(out)
  }
}
