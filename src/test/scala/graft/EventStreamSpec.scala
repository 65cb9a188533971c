package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStream

/** Structured Streaming ↔ batch equivalence: the same transform over
  * readStream (AvailableNow, memory sink) must reproduce the batch
  * result. */
class EventStreamSpec extends SparkSpec {

  test("streaming hourly agg equals batch hourly agg") {
    val q = EventStream.runToMemory(spark, sf, "graft_s01_test",
      EventStream.hourlyAgg, mode = "complete")
    q.awaitTermination(120000)
    val streamed = spark.table("graft_s01_test")
      .orderBy("hour", "event_type").collect()
    val batch = EventStream.hourlyAgg(Tables.events(spark, sf))
      .orderBy("hour", "event_type").collect()
    assert(streamed.length == batch.length, s"${streamed.length} vs ${batch.length}")
    assert(streamed.sameElements(batch))
  }

  test("streaming dedup emits at most one row per key") {
    val q = EventStream.runToMemory(spark, sf, "graft_s02_test",
      EventStream.dedupStream)
    q.awaitTermination(120000)
    val out = spark.table("graft_s02_test")
    val dupes = out.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(dupes.count() == 0)
    // every key present in the source appears exactly once
    val keys = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(out.count() == keys)
  }
}
