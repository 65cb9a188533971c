package graft.sources.v2

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** §2.D x08 — a full DataSource V2 implementation: the deterministic
  * SYNTHETIC-CORPUS source (`format("graft.sources.v2.SynthSource")`).
  *
  * Why a training-data engine needs one: load generation, scale
  * rehearsal and backfill shouldn't read storage at all — a 100 TB
  * pipeline is rehearsed against a source that can materialize any
  * slice of a deterministic corpus on demand, splittable across every
  * executor. This is the Spark-native equivalent of esop's synthetic
  * test fixtures (reference: `core/src/test/.../Generators`-style
  * data), expressed as a first-class connector instead of a driver
  * loop writing files.
  *
  * Scale contract (what the spec pins):
  *   - `planInputPartitions` splits the id range into `partitions`
  *     independent splits — executors generate rows in parallel, no
  *     driver materialization, no storage IO.
  *   - doc_id range/equality predicates are PUSHED (SupportsPushDown
  *     Filters): splits wholly outside the bounds are never planned
  *     (partition pruning), and the surviving splits clamp their
  *     iteration range exactly — pushed predicates are fully handled
  *     by the source (not re-evaluated post-scan).
  *   - column pruning (SupportsPushDownRequiredColumns): the reader
  *     generates ONLY the requested columns — pruning `text` skips
  *     the word-salad synthesis entirely, the dominant per-row cost.
  *
  * Row semantics mirror the `documents` table: (doc_id, text, lang,
  * source, n_chars), word-salad text from a fixed vocabulary chosen
  * by a splitmix-style hash of (doc_id, position) — byte-identical
  * across runs, partition layouts, and pushdown shapes.
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      splits = Option(properties.get("partitions")).map(_.toInt).getOrElse(8),
      wordsPerDoc = Option(properties.get("words")).map(_.toInt).getOrElse(24))
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  val vocab: Array[String] = Array(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "query", "join", "window", "order",
    "data", "column", "small", "line", "customer", "the", "a")

  val langs: Array[String] = Array("en", "zh", "fr", "es", "de")

  /** splitmix64 finalizer — cheap, high-quality per-(doc, pos) mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textFor(docId: Long, words: Int): String = {
    val sb = new java.lang.StringBuilder(words * 6)
    var i = 0
    while (i < words) {
      if (i > 0) sb.append(' ')
      sb.append(vocab(((mix(docId * 131 + i) >>> 8) % vocab.length).toInt))
      i += 1
    }
    sb.toString
  }
}

final class SynthTable(rows: Long, splits: Int, wordsPerDoc: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, splits, wordsPerDoc)
}

final class SynthScanBuilder(rows: Long, splits: Int, wordsPerDoc: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L // inclusive
  private var hi: Long = rows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.schema

  /** Accept doc_id range/equality predicates; everything else is a
    * residual Spark keeps. IsNotNull(doc_id) is vacuous (non-nullable)
    * and accepted as handled. Accepted filters are applied EXACTLY by
    * the reader, so the boundary arithmetic must saturate: `v + 1` at
    * Long.MaxValue would wrap to Long.MinValue and silently undo
    * (GreaterThan) or empty (LessThanOrEqual) the clamp. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating successor: ids live in [0, rows) with rows <=
    // MaxValue, so a lower bound saturated AT MaxValue already empties
    // every split, and an upper bound at MaxValue excludes nothing
    def succ(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    val (acc, residual) = filters.partition {
      case GreaterThan("doc_id", v: Long) => lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("doc_id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("doc_id", v: Long) =>
        if (v != Long.MaxValue) hi = math.min(hi, v + 1); true
      case EqualTo("doc_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case IsNotNull("doc_id") => true
      case _ => false
    }
    pushed = acc
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(rows, splits, wordsPerDoc, lo, hi, required, pushed)
}

final class SynthScan(rows: Long, splits: Int, wordsPerDoc: Int,
    lo: Long, hi: Long, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synth rows=$rows range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]"

  /** Fixed splits of [0, rows); splits wholly outside the pushed
    * bounds are pruned HERE — they never become tasks. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + splits - 1) / splits)
    val out = ArrayBuffer.empty[InputPartition]
    var start = 0L
    while (start < rows) {
      val end = math.min(start + per, rows)
      val s = math.max(start, lo)
      val e = math.min(end, hi)
      if (s < e) out += SynthPartition(s, e)
      start = end
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(wordsPerDoc, required.fieldNames)
}

final case class SynthPartition(start: Long, end: Long) extends InputPartition

final class SynthReaderFactory(wordsPerDoc: Int, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new SynthReader(p.start, p.end, wordsPerDoc, cols)
  }
}

/** Generates the pruned projection only: with `text`/`n_chars` pruned
  * away the word-salad synthesis never runs. Column dispatch is
  * resolved ONCE here (an array of per-column generators) — get() is
  * the per-row hot path of the load-generation source, so it must do
  * no name matching and no fresh collection allocation per row. */
final class SynthReader(start: Long, end: Long, wordsPerDoc: Int, cols: Array[String])
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  private val needText = cols.contains("text") || cols.contains("n_chars")
  private var text: String = _

  private val gens: Array[() => Any] = cols.map {
    case "doc_id" => () => id
    case "text" => () => UTF8String.fromString(text)
    case "lang" => () =>
      UTF8String.fromString(SynthSource.langs(((SynthSource.mix(id) >>> 8) % SynthSource.langs.length).toInt))
    case "source" => () => UTF8String.fromString("src" + (id % 5))
    case "n_chars" => () => text.length.toLong
  }
  override def next(): Boolean = { id += 1; id < end }

  override def get(): InternalRow = {
    if (needText) text = SynthSource.textFor(id, wordsPerDoc)
    // fresh backing array per row — InternalRow.fromSeq wraps without
    // copying, so a reused buffer would retroactively mutate rows a
    // downstream operator may still hold
    val row = new Array[Any](gens.length)
    var i = 0
    while (i < gens.length) { row(i) = gens(i)(); i += 1 }
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(row))
  }

  override def close(): Unit = ()
}
