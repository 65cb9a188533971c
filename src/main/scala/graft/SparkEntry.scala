package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Backup, Curation, Dedup, Multimodal, Relational, Similarity, Streaming, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query map; `oracleSql` carries
  * the DuckDB-equivalent SQL the driver hash-compares against at
  * sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q01_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Backup.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries ++
      Streaming.queries ++ Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Backup.oracle ++ Dedup.oracle ++
      TextAnalysis.oracle ++ Similarity.oracle ++ Multimodal.oracle ++
      Streaming.oracle ++ Curation.oracle
}
