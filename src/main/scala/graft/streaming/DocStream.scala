package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.model.Corpus
import graft.operators.TextAnalysis

/** §2.D s08 — Structured Streaming over the DOCUMENT feed: the
  * training-data pipeline's ingestion side. A 100 TB corpus arrives
  * continuously (crawl drops, partner feeds); the curation gate —
  * normalize, quality-score, keep/drop — must run as the documents
  * land, not as a nightly batch. The transform is defined once and
  * applied to both the batch table (the oracle) and `readStream`
  * (proven equal in `EventStreamSpec`).
  *
  * State: the aggregation keys are (lang, source) — a bounded,
  * low-cardinality domain (languages × feeds), so complete-mode state
  * is O(|langs|·|sources|) regardless of stream length. The per-row
  * scoring is stateless and kernel-backed (CharCounts), identical to
  * d09's batch scoring by construction (same
  * [[TextAnalysis.qualityCols]] call).
  */
object DocStream {

  /** Parquet schema of the documents table (for the file source). */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocsStream(s: SparkSession, dir: String): DataFrame =
    s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** The curation gate: per-(lang, source) doc counts, quality-bar
    * keeps, and total word volume — the live dashboard a corpus
    * ingestion pipeline watches. Per-row score ≡ d09 (shared
    * definition); keep bar = quality ≥ 0.1. */
  def curate(docs: DataFrame): DataFrame =
    TextAnalysis.qualityCols(Corpus.normalized(docs))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality") >= 0.1, 1L).otherwise(0L)).as("n_keep"),
        sum(col("n_words")).as("total_words"))

  /** Run a document-stream transform to a memory sink (AvailableNow —
    * drains the source then stops), for the stream ≡ batch specs. */
  def runToMemory(s: SparkSession, dir: String, name: String,
      transform: DataFrame => DataFrame, mode: String = "complete"): StreamingQuery =
    transform(readDocsStream(s, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
}
