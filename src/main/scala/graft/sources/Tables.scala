package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** Loaders for the shared testdata tables.
  *
  * Each loader is a plain parquet scan; Catalyst pushes filters and
  * prunes columns into it, so operators downstream never pay for
  * columns they do not read. On a cluster the same loaders read
  * partitioned directories transparently.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  /** `events.ts` is nanosecond-precision parquet, which Spark's vectorized
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw
    * nanos-since-epoch (legacy nanosAsLong conf — set HERE as a session
    * side effect, and defensively in [[graft.GraftSession.configure]])
    * and truncate to microseconds — the same µs truncation DuckDB
    * applies when reading ns parquet, so both engines see identical
    * timestamps. Any new code path reading events.parquet must go
    * through this loader. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  def load(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
