package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * Whole-stage-codegen friendly (doGenCode emits a tight primitive
  * loop, no boxing, no UDF serialization) — this is the hot inner
  * kernel for similarity search over embeddings (reference analogue:
  * esop's HashServiceImpl compares digests; here we compare vectors).
  * At 100 TB scale the candidate-pair stream from LSH bucketing
  * (see [[graft.operators.Similarity]]) flows through this expression
  * inside one codegen stage.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_cosine expects (array<float>, array<float>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  /** Null elements are skipped in both slots (defined behavior for the
    * registered SQL function); the per-element branch is only emitted
    * when the input ArrayTypes can actually hold null elements — same
    * policy as [[LongVecKernel]], keeping internal plans branch-free. */
  @transient private[graft] lazy val mayContainNullElems: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val guarded = mayContainNullElems
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (!guarded || (!x.isNullAt(i) && !y.isNullAt(i))) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi
      }
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val guard =
        if (mayContainNullElems) s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $guard
        |  final double $xi = (double) $a.getFloat($i);
        |  final double $yi = (double) $b.getFloat($i);
        |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        |}
        |${ev.value} = ($nx == 0.0 || $ny == 0.0)
        |  ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API entry point: `cosineSim($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
