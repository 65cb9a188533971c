package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** SURVEY §2.C d26 / §2.D x06 — KMV (k-minimum-values) distinct-count
  * sketch as a native `TypedImperativeAggregate`.
  *
  * The d20 formulation sketches ONE global set and pays a corpus-wide
  * `distinct` shuffle (every distinct hash crosses the wire) because
  * it also reports the exact count. This aggregate is the GROUPED,
  * one-pass form a 100 TB pipeline needs: each task keeps at most k
  * hashes per group in a bounded ordered buffer, partial buffers merge
  * associatively, and the shuffle carries ≤ k longs per (group,
  * partition) — the sketch-merge IS the aggregation tree, the same
  * shape esop would need to count distinct objectKeys per bucket
  * without materializing them (reference `impl/Manifest.java:452-454`
  * counts a deduplicated key set in memory; this is that statistic
  * made mergeable).
  *
  * Estimator (exactly mirrorable in DuckDB, unlike HLL registers):
  * with h_k = k-th smallest DISTINCT hash over a 2³² hash space,
  * est = (k−1)·2³²/h_k; a buffer that never filled holds the whole
  * distinct set, so the estimate is the exact count.
  *
  * Determinism: the buffer is a sorted distinct set, so update/merge
  * order cannot affect the result — bit-identical across partitioning,
  * retries, and AQE re-plans.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"graft_kmv needs k > 1, got $k")

  override def prettyName: String = "graft_kmv"
  override def nullable: Boolean = false
  override def dataType: DataType = KmvSketchAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_kmv expects a long hash column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(b: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (b.size() < k) { b.add(h); () }
    else if (h < b.last()) { if (b.add(h)) { b.pollLast(); () } }

  override def update(
      b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(b, v.asInstanceOf[Long])
    b
  }

  override def merge(
      b: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val n = b.size()
    val row = new GenericInternalRow(3)
    row.update(0, n.toLong)
    if (n == 0) {
      row.update(1, null)
      row.update(2, 0.0d)
    } else {
      val hk = b.last().longValue()
      row.update(1, hk)
      row.update(2,
        if (n < k) n.toDouble else (k - 1).toDouble * 4294967296.0 / hk.toDouble)
    }
    row
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * b.size())
    buf.putInt(b.size())
    val it = b.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { b.add(buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

object KmvSketchAgg {

  /** (k_actual, h_k, est_distinct): sketch fill, k-th smallest distinct
    * hash, and the KMV estimate (exact when the sketch never filled). */
  val resultType: StructType = StructType(Seq(
    StructField("k_actual", LongType, nullable = false),
    StructField("h_k", LongType, nullable = true),
    StructField("est_distinct", DoubleType, nullable = false)))

  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      new KmvSketchAgg(GraftBridge.expression(c), k).toAggregateExpression())
}

/** The PAYLOAD form of [[KmvSketchAgg]] — same bounded TreeSet buffer,
  * same merge law, but `eval` emits the sketch VALUES (the ≤k smallest
  * distinct hashes, ascending) instead of just the summary statistic.
  *
  * This is what makes KMV a sketch ALGEBRA rather than a one-shot
  * estimator: two emitted sketches union-merge downstream with plain
  * `array` ops (sorted-distinct union, keep the k smallest), and the
  * union sketch estimates |A∪B| — hence |A∩B| and Jaccard — without
  * ever revisiting the data (d73). At 100 TB the per-group payload is
  * ≤ k longs, so the overlap matrix for S sources costs one corpus
  * pass + an S²-row driver-free cross of bounded arrays. */
case class KmvValuesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"graft_kmv_values needs k > 1, got $k")

  private val inner = KmvSketchAgg(child, k)

  override def prettyName: String = "graft_kmv_values"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(
      b: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    inner.update(b, input)
  override def merge(
      b: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(b, other)

  override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](b.size())
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(b)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvValuesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvValuesAgg =
    copy(child = newChild)
}

object KmvValuesAgg {
  def apply(c: Column, k: Int): Column =
    GraftBridge.column(
      new KmvValuesAgg(GraftBridge.expression(c), k).toAggregateExpression())
}
