package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** All ordered index pairs (i < j) of an array in ONE per-row pass:
  * `[x0, x1, x2]` → `[(x0,x1), (x0,x2), (x1,x2)]` as
  * array<struct<a, b>>, in (i, j) lexicographic order — so when the
  * input is SORTED, `a < b` falls out of element order exactly as in
  * the self-join it replaces.
  *
  * Value-identical (including pair ORDER) to the HOF formulation it
  * replaces —
  * `flatten(transform(c, (a, i) -> transform(slice(c, i + 2, size(c)),
  * b -> struct(a, b))))` — which was CodegenFallback: every group key
  * paid m interpreted slice() calls (each copying the array tail, an
  * O(m²) copy before the pairs even materialize) plus m interpreted
  * lambda evaluations per element. This kernel emits the same
  * m(m−1)/2 structs in one primitive loop over the group's member
  * array. The m² pair fan-out itself is the declared exact-baseline
  * ceiling either way (documented at the band-pair call sites); this
  * only removes the interpreter and the slice copies from in front of
  * it. */
case class PairCombos(child: Expression) extends UnaryExpression {

  @transient private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType, elemNullable),
      StructField("b", elemType, elemNullable))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_combos expects an array, got ${t.simpleString}")
  }

  override def prettyName: String = "graft_pair_combos"

  override def nullSafeEval(input: Any): Any =
    PairCombosKernel.compute(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val etRef = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairCombosKernel.compute($c, $etRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
}

object PairCombos {
  def apply(c: Column): Column =
    GraftBridge.column(PairCombos(GraftBridge.expression(c)))
}

object PairCombosKernel {
  private val Empty = new GenericArrayData(Array.empty[Any])

  def compute(arr: ArrayData, et: DataType): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return Empty
    // m²/2 structs materialized per key — the same fan-out the HOF
    // built (and the self-join streamed); guard the int overflow a
    // degenerate mega-cluster would hit instead of corrupting silently
    val total = n.toLong * (n - 1) / 2
    require(total <= Int.MaxValue,
      s"pair combination fan-out $total for a $n-member group exceeds array bounds")
    val elems = arr.toObjectArray(et)
    val out = new Array[Any](total.toInt)
    var idx = 0
    var i = 0
    while (i < n - 1) {
      val a = elems(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, elems(j)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
