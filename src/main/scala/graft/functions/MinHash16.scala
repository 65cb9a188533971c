package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All 16 MinHash family members of one shingle in a single kernel.
  *
  * Value-identical to the SQL formulation
  * `conv(substr(md5(concat('s', s div 4, '#', gram)), (s%4)*8+1, 8), 16, 10)`
  * (the DuckDB oracle keeps computing it that way), but reads the four
  * 32-bit members straight from each digest's bytes — no hex-string
  * materialization, no substring, no base-16 parse, one UTF8→bytes
  * conversion per shingle instead of four. The call stays inside
  * whole-stage codegen via a static kernel invocation.
  */
case class MinHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash16 expects string, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_minhash16"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHash16Kernel.compute(
      input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  graft.functions.MinHash16Kernel.compute($c.getBytes()));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHash16 =
    copy(child = newChild)
}

object MinHash16 {
  def apply(c: Column): Column =
    GraftBridge.column(MinHash16(GraftBridge.expression(c)))
}

/** Per-row MinHash SIGNATURE of a whole shingle array: the
  * elementwise minimum of [[MinHash16]] over every element, folded in
  * one kernel loop (init Long.MaxValue, so an empty array yields the
  * neutral signature). Value-identical to
  * `aggregate(transform(garr, g -> graft_minhash16(g)), init,
  * zip_with(least))` but with no per-gram array allocation, no boxed
  * lambda evaluation, and the call stays inside whole-stage codegen —
  * the d43 fused pipeline computes d03's per-doc signature with this
  * in a single pass over the row's gram array. */
case class MinHashFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_fold expects array<string>, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_minhash_fold"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHash16Kernel.fold(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  graft.functions.MinHash16Kernel.fold($c));
    """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashFold =
    copy(child = newChild)
}

object MinHashFold {
  def apply(c: Column): Column =
    GraftBridge.column(MinHashFold(GraftBridge.expression(c)))
}

object MinHash16Kernel {
  private val salts: Array[Array[Byte]] =
    Array("s0#", "s1#", "s2#", "s3#").map(_.getBytes("UTF-8"))

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 16 unsigned-32-bit members: digest d = md5("s<d>#" ++ gram), member
    * d·4+j = big-endian bytes [4j, 4j+4) of digest d — exactly the value
    * of the first/second/third/fourth 8 hex chars parsed base-16. */
  def compute(gram: Array[Byte]): Array[Long] = {
    val md = digests.get()
    val out = new Array[Long](16)
    var d = 0
    while (d < 4) {
      md.reset()
      md.update(salts(d))
      md.update(gram)
      val dig = md.digest()
      var j = 0
      while (j < 4) {
        out(d * 4 + j) =
          ((dig(j * 4) & 0xffL) << 24) | ((dig(j * 4 + 1) & 0xffL) << 16) |
            ((dig(j * 4 + 2) & 0xffL) << 8) | (dig(j * 4 + 3) & 0xffL)
        j += 1
      }
      d += 1
    }
    out
  }

  /** Elementwise min of [[compute]] over every NON-NULL element of
    * `grams` (Long.MaxValue init — empty array → neutral signature;
    * null elements are skipped, the defined semantics for the
    * registered SQL form — graft-internal gram arrays never hold
    * nulls). */
  def fold(grams: org.apache.spark.sql.catalyst.util.ArrayData): Array[Long] = {
    val out = Array.fill(16)(Long.MaxValue)
    val n = grams.numElements()
    var i = 0
    while (i < n) {
      if (grams.isNullAt(i)) { i += 1 }
      else {
      val h = compute(grams.getUTF8String(i).getBytes)
      var k = 0
      while (k < 16) {
        if (h(k) < out(k)) out(k) = h(k)
        k += 1
      }
      i += 1
      }
    }
    out
  }
}
