package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch-dataset materialization for operators that need an external
  * round-trip fixture (b18's remote-bucket listing, b22's manifest
  * JSON documents).
  *
  * Deployment contract: set `spark.graft.scratch` to a SHARED
  * filesystem path (HDFS/S3/...) on a real cluster — executors must be
  * able to read what the driver materializes. The default is a per-JVM
  * temp directory (correct for local[*] and tests). Datasets are
  * written ONCE per (name, key) per JVM — query re-construction reuses
  * the materialized path instead of re-running the write job — and
  * every write lands in a freshly-UUID'd directory, so concurrent
  * materializations (same JVM or different processes) can never race
  * an Overwrite against a reader: a lost TrieMap race just orphans one
  * small directory, and all of this JVM's directories are deleted by a
  * shutdown hook (its own UUIDs only — other JVMs' fixtures under a
  * shared root are untouched).
  */
object Scratch {

  private val materialized =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(org.apache.hadoop.conf.Configuration, String)]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { case (conf, path) =>
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(conf).delete(p, true)
        } catch { case _: Throwable => () }
      }
    }))
  }

  private lazy val defaultRoot =
    java.nio.file.Files.createTempDirectory("graft-scratch").toString

  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.scratch").getOrElse(defaultRoot)

  /** Build-and-cache: the first request for this (name, key) in this
    * JVM writes `build` under `root/name/<fresh-uuid>` and caches the
    * path; later requests return the same path without any IO. */
  def materialize(s: SparkSession, name: String, key: String,
      write: (DataFrame, String) => Unit = (df, p) => IO.writeParquet(df, p))(
      build: => DataFrame): String =
    materialized.getOrElseUpdate(s"$name|$key", {
      val path = s"${root(s)}/$name/${java.util.UUID.randomUUID().toString.take(12)}"
      write(build, path)
      created.add((s.sparkContext.hadoopConfiguration, path))
      path
    })
}
