package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions._

/** §2.D — Structured Streaming over the events feed.
  *
  * The transforms are defined once over a DataFrame and applied to
  * BOTH the batch table and a `readStream` source — the batch run is
  * the oracle for the streaming run (tested in `EventStreamSpec`).
  * Esop analogue: continuous commit-log/backup event ingestion.
  *
  * Scale: tumbling windows + watermark bound the state store;
  * `dropDuplicates` state is likewise watermark-expired. On a real
  * cluster the same code runs with a durable checkpoint location and
  * kafka/file sources — nothing here is local-mode-specific.
  */
object EventStream {

  /** Parquet schema of the events table with ns-timestamps read as
    * raw longs (see [[graft.sources.Tables.events]]). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize a raw events frame (batch or stream): ns→µs timestamps. */
  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Tumbling 1-hour window aggregation with a 1-hour watermark —
    * identical semantics in batch (where the watermark is a no-op). */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), asDouble(sum(dec2(col("value")))).as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming dedup: first event per (user_id, event_type) inside the
    * watermark horizon. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")

  /** File-source stream over a testdata dir (ns ts read as long). */
  def readEventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-stream sources need a directory; glob-filter to the events
    // table inside the sf dir
    normalize(s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir))
  }

  /** Run `transform` over the event stream into an in-memory sink,
    * processing all available input (test/CI harness). */
  def runToMemory(s: SparkSession, dir: String, name: String,
      transform: DataFrame => DataFrame, mode: String = "append"): StreamingQuery =
    transform(readEventsStream(s, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
}
