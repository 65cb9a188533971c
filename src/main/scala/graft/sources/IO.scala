package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** §2.D x03 — source/sink helpers.
  *
  * Thin, declarative wrappers: every reader yields a plain scan that
  * Catalyst can push filters/pruning into; writers expose the two
  * layout decisions that matter at 100 TB — partition columns (for
  * partition pruning) and explicit file sizing via repartition before
  * write (small-file avoidance).
  */
object IO {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def readCsv(s: SparkSession, path: String, header: Boolean = true): DataFrame =
    s.read.option("header", header.toString).option("inferSchema", "true").csv(path)

  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  def readOrc(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Raw text ingestion (one row per line, column `value`) — the entry
    * point for unprocessed corpus files feeding the text pipeline. */
  def readText(s: SparkSession, path: String): DataFrame =
    s.read.text(path)

  /** Partitioned parquet write; `targetFiles` caps output files per
    * partition directory (small-file control on large clusters). */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, targetFiles: Int = 0): Unit = {
    val sized = if (targetFiles > 0) df.repartition(targetFiles) else df
    val w = sized.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed table write: co-locates rows by `bucketCol` so repeated
    * joins/aggregations on that key skip the shuffle entirely — the
    * core join strategy for fact⋈fact at 100 TB (both sides bucketed
    * on the join key → zero-exchange SortMergeJoin). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
