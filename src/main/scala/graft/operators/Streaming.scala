package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables
import graft.streaming.EventStream

/** §2.D s01/s02 — batch-equivalent entry points for the streaming
  * transforms (the driver's oracle runs batch SQL; `EventStreamSpec`
  * proves the same transform over `readStream` produces the same
  * rows).
  */
object Streaming {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour window aggregation — the exact DataFrame transform
    // the streaming job runs (watermark is a no-op on batch input).
    "s01_stream_window" -> { (s, dir) =>
      EventStream.hourlyAgg(Tables.events(s, dir))
        .orderBy("hour", "event_type")
    },

    // Deterministic dedup: first event (min event_id) per
    // (user_id, event_type) — batch twin of the streaming dropDuplicates.
    "s02_stream_dedup" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event"), count(lit(1)).as("n_events"))
        .orderBy("user_id", "event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "s01_stream_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        |  COUNT(1) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "s02_stream_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_event,
        |  COUNT(1) AS n_events
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin
  )
}
