package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructType}

/** Codegen kernels over quantized (long) vectors — the hot inner loops
  * of the similarity operators. `zip_with + aggregate` builds an
  * intermediate array per row-pair; these emit a single primitive loop
  * inside whole-stage codegen, which is what makes the O(n²)/bucketed
  * pair streams tractable (measured ~8× on the brute-force top-k).
  */
abstract class LongVecKernel extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  /** Java source for one element's contribution given element vars. */
  protected def combine(x: String, y: String): String
  protected def combineEval(x: Long, y: Long): Long

  /** Null ELEMENTS are skipped (contribute nothing) — defined behavior
    * for the registered SQL functions. The per-element branch is only
    * emitted when either input's ArrayType can actually hold null
    * elements: graft's internal plans build their arrays with
    * containsNull=false ([[graft.model.Corpus.qvecs]], the hyperplane /
    * centroid tables), so the bucketed/brute-force pair streams run the
    * branch-free loop — an unconditional guard cost d06 +60% in r3. */
  @transient private[graft] lazy val mayContainNullElems: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    if (mayContainNullElems) {
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          acc += combineEval(x.getLong(i), y.getLong(i))
        i += 1
      }
    } else {
      while (i < n) {
        acc += combineEval(x.getLong(i), y.getLong(i))
        i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val guard =
        if (mayContainNullElems) s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  $guard
        |  final long $xi = $a.getLong($i);
        |  final long $yi = $b.getLong($i);
        |  $acc += ${combine(xi, yi)};
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
}

/** Exact integer dot product: Σ xᵢ·yᵢ. */
case class DotLong(left: Expression, right: Expression) extends LongVecKernel {
  override def prettyName: String = "graft_dot_long"
  override protected def combine(x: String, y: String): String = s"$x * $y"
  override protected def combineEval(x: Long, y: Long): Long = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
}

/** Exact squared euclidean distance: Σ (xᵢ−yᵢ)². */
case class SqDistLong(left: Expression, right: Expression) extends LongVecKernel {
  override def prettyName: String = "graft_sqdist_long"
  override protected def combine(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combineEval(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistLong =
    copy(left = l, right = r)
}

object DotLong {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DotLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** Prefix dot products at ascending cut points: out[k] = Σ_{i<cuts(k)}
  * xᵢ·yᵢ — ONE pass over the vectors with a checkpoint at each cut,
  * for the MRL/truncation evaluators (d82): the slice-per-budget
  * formulation pays |cuts| array allocations + |cuts| loops PER PAIR
  * (measured 131 s at sf0.1); this emits a single segmented loop
  * inside whole-stage codegen (2.5 s). With x == y it yields the
  * prefix norms, so the same kernel serves both sides of the cosine. */
case class PrefixDotsLong(left: Expression, right: Expression, cuts: Seq[Int])
    extends LongVecKernel {
  require(cuts.nonEmpty && cuts == cuts.sorted && cuts.distinct == cuts,
    s"cuts must be ascending and distinct: $cuts")

  override def prettyName: String = "graft_prefix_dots_long"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // combine() is shared with the accumulation loop below; combineEval
  // keeps the interpreted twin in lock-step with the generated source
  override protected def combine(x: String, y: String): String = s"$x * $y"
  override protected def combineEval(x: Long, y: Long): Long = x * y

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Long](cuts.length)
    var acc = 0L; var i = 0; var k = 0
    while (k < cuts.length) {
      val end = math.min(cuts(k), n)
      while (i < end) {
        if (!mayContainNullElems || (!x.isNullAt(i) && !y.isNullAt(i)))
          acc += combineEval(x.getLong(i), y.getLong(i))
        i += 1
      }
      out(k) = acc
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val end = ctx.freshName("end")
      val guard =
        if (mayContainNullElems) s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      val segments = cuts.zipWithIndex.map { case (c, k) =>
        s"""
          |$end = java.lang.Math.min($c, $n);
          |for (; $i < $end; $i++) {
          |  $guard
          |  $acc += ${combine(s"$a.getLong($i)", s"$b.getLong($i)")};
          |}
          |$out[$k] = $acc;
        """.stripMargin
      }.mkString("\n")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |final long[] $out = new long[${cuts.length}];
        |long $acc = 0L;
        |int $i = 0;
        |int $end = 0;
        |$segments
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PrefixDotsLong =
    copy(left = l, right = r)
}

object PrefixDotsLong {
  def apply(a: Column, b: Column, cuts: Seq[Int]): Column =
    GraftBridge.column(
      PrefixDotsLong(GraftBridge.expression(a), GraftBridge.expression(b), cuts))
}

object SqDistLong {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SqDistLong(GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** ADC table-lookup sum: Σ_j lut[j·stride + codes[j]] (0-based) — the
  * asymmetric-distance inner loop of PQ serving (d80/d81). The
  * `aggregate(sequence(0, m-1), …)` higher-order formulation this
  * replaces is CodegenFallback: every candidate row paid an
  * interpreted 8-step fold with two boxed `element_at` calls per step
  * INSIDE the whole-stage-codegen pipeline's hottest stream (one row
  * per (query, cell-mate)). This emits the same sum as one primitive
  * loop. Contract: codes[j] ∈ [0, stride); a null or out-of-range
  * element contributes 0 (the family's skip-null convention — never
  * exercised by graft's own plans, whose codes are coalesced and
  * bounded by construction). */
case class LutSumLong(left: Expression, right: Expression, stride: Int)
    extends BinaryExpression {

  override def prettyName: String = "graft_lut_sum_long"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(IntegerType, _))
          if stride > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint> lut, array<int> codes, stride > 0), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, $stride)")
    }

  /** Same lazily-computed guard-elision as [[LongVecKernel]]: graft's
    * own plans build both sides containsNull=false, so the hot loop is
    * branch-free; SQL callers with nullable elements keep the defined
    * skip behavior. */
  @transient private[graft] lazy val mayContainNullElems: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    var acc = 0L; var j = 0
    while (j < m) {
      if (!mayContainNullElems || !codes.isNullAt(j)) {
        val idx = j * stride + codes.getInt(j)
        if (idx >= 0 && idx < n && (!mayContainNullElems || !lut.isNullAt(idx)))
          acc += lut.getLong(idx)
      }
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      val codeGuard =
        if (mayContainNullElems) s"if ($b.isNullAt($j)) continue;" else ""
      val lutGuard = if (mayContainNullElems) s" && !$a.isNullAt($idx)" else ""
      s"""
        |final int $m = $b.numElements();
        |final int $n = $a.numElements();
        |long $acc = 0L;
        |for (int $j = 0; $j < $m; $j++) {
        |  $codeGuard
        |  final int $idx = $j * $stride + $b.getInt($j);
        |  if ($idx >= 0 && $idx < $n$lutGuard) $acc += $a.getLong($idx);
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LutSumLong =
    copy(left = l, right = r)
}

object LutSumLong {
  def apply(lut: Column, codes: Column, stride: Int): Column =
    GraftBridge.column(
      LutSumLong(GraftBridge.expression(lut), GraftBridge.expression(codes), stride))
}

/** Two-nearest-centroid fold: given a vector and the broadcast sorted
  * centroid array (struct<c:int, cv:array<bigint>>, ascending c), emit
  * [d1, c1, d2, c2] as array<bigint> — the top-2 (squared distance,
  * cell) accumulator pair under strict `<` (ties resolve to the
  * earlier = lower cell, mirroring ORDER BY d ASC, c ASC).
  *
  * This is [[graft.operators.Similarity.assignTop2]]'s inner loop,
  * which every IVF-family probe runs once per corpus row. The
  * `aggregate(transform(cents, …))` higher-order formulation it
  * replaces is CodegenFallback: per row it allocated one struct per
  * centroid, then folded interpreted with a boxed 4-field struct per
  * step, the sqdist kernel inside evaluated via nullSafeEval — the
  * d80 ADC lesson applied to the assignment side. Null struct
  * elements / fields / vector elements are skipped (the family
  * convention; graft's own plans are containsNull=false throughout).
  * Fewer than two (or zero) centroids leave c2 (c1) at -1 with the
  * distance at Long.MaxValue — the HOF fold's init values. */
case class ArgminTop2Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_argmin_top2_long"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
          ArrayType(StructType(Array(f0, f1)), _))
          if f0.dataType == IntegerType &&
            f1.dataType.isInstanceOf[ArrayType] &&
            f1.dataType.asInstanceOf[ArrayType].elementType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint> q, array<struct<c:int, cv:array<bigint>>> cents), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  @transient private[graft] lazy val guarded: Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, qn), ArrayType(StructType(fs), cn)) =>
        qn || cn || fs.exists(_.nullable) ||
          fs(1).dataType.asInstanceOf[ArrayType].containsNull
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArgminTop2Kernel.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], guarded)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArgminTop2Kernel.compute($a, $b, $guarded);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArgminTop2Long =
    copy(left = l, right = r)
}

object ArgminTop2Long {
  def apply(q: Column, cents: Column): Column =
    GraftBridge.column(
      ArgminTop2Long(GraftBridge.expression(q), GraftBridge.expression(cents)))
}

object ArgminTop2Kernel {
  def compute(q: ArrayData, cents: ArrayData, guarded: Boolean): ArrayData = {
    val k = cents.numElements()
    val qn = q.numElements()
    var d1 = Long.MaxValue; var c1 = -1L
    var d2 = Long.MaxValue; var c2 = -1L
    var i = 0
    while (i < k) {
      if (!guarded || !cents.isNullAt(i)) {
        val e = cents.getStruct(i, 2)
        if (!guarded || (!e.isNullAt(0) && !e.isNullAt(1))) {
          val c = e.getInt(0)
          val cv = e.getArray(1)
          val n = math.min(qn, cv.numElements())
          var d = 0L; var t = 0
          if (guarded) {
            while (t < n) {
              if (!q.isNullAt(t) && !cv.isNullAt(t)) {
                val dx = q.getLong(t) - cv.getLong(t); d += dx * dx
              }
              t += 1
            }
          } else {
            while (t < n) {
              val dx = q.getLong(t) - cv.getLong(t); d += dx * dx
              t += 1
            }
          }
          if (d < d1) { d2 = d1; c2 = c1; d1 = d; c1 = c }
          else if (d < d2) { d2 = d; c2 = c }
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(d1, c1, d2, c2))
  }
}
