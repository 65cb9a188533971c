package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-k-gram shingles of a word array in ONE per-row pass:
  * `(["a","b","c","d"], k=3)` → `["a b c", "b c d"]`, in position
  * order (first-occurrence order when `distinct`), empty below k
  * words.
  *
  * Value-identical (including element ORDER) to the HOF formulation it
  * replaces —
  * `transform(sequence(0, size(ws)-k), i ->
  * concat_ws(' ', ws[i], …, ws[i+k-1]))`, optionally wrapped in
  * `array_distinct` — which was CodegenFallback: every doc paid
  * |words| interpreted lambda steps, each allocating the index box and
  * evaluating concat_ws interpreted, before the sketch/join work even
  * started. k=3 distinct is the shingle builder under the whole exact
  * n-gram family (d02/d30/d71/d103/d34/d104/d105 via the shared gram
  * stream) AND the MinHash/LSH family (d03/d04 + consumers via
  * minhashWide); k=2 raw is the bigram stream under d29/d37 — the
  * per-doc cost is paid once per corpus pass at any scale. Null words
  * are skipped inside their gram (concat_ws semantics); the oracle
  * twin is the same concat over DuckDB's list slice. */
case class GramShingles(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, s"gram size must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_grams expects array<string>, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_grams"

  /** Null-element handling is only paid when the input ArrayType can
    * hold null elements (`split` yields containsNull=false, so graft's
    * own plans run the branch-free loop). */
  @transient private[graft] lazy val mayContainNullElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullSafeEval(input: Any): Any =
    GramKernel.compute(input.asInstanceOf[ArrayData], k, distinct, mayContainNullElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKernel.compute($c, $k, $distinct, $mayContainNullElems);")

  override protected def withNewChildInternal(newChild: Expression): GramShingles =
    copy(child = newChild)
}

object GramShingles {
  def apply(c: Column, k: Int, distinct: Boolean): Column =
    GraftBridge.column(GramShingles(GraftBridge.expression(c), k, distinct))
}

object GramKernel {
  private val Sep = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(ws: ArrayData, k: Int, distinct: Boolean, guarded: Boolean): ArrayData = {
    val n = ws.numElements()
    if (n < k) return Empty
    val m = n - k + 1
    // LinkedHashSet = array_distinct's first-occurrence order under the
    // same binary string equality (UTF8String.equals)
    val seen = if (distinct) new java.util.LinkedHashSet[UTF8String](m * 2) else null
    val raw = if (distinct) null else new Array[AnyRef](m)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < k) {
        // concatWs skips null inputs — SQL concat_ws parity; words are
        // never null in graft's own plans (split output)
        parts(j) =
          if (guarded && ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      val g = UTF8String.concatWs(Sep, parts: _*)
      if (distinct) seen.add(g) else raw(i) = g
      i += 1
    }
    if (distinct) new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
    else new GenericArrayData(raw)
  }
}
