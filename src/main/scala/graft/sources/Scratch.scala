package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch-dataset materialization for operators that need an external
  * round-trip fixture (b18's remote-bucket listing, b22's manifest
  * JSON documents).
  *
  * Deployment contract: set `spark.graft.scratch` to a SHARED
  * filesystem path (HDFS/S3/...) on a real cluster — executors must be
  * able to read what the driver materializes. The default is a per-JVM
  * temp directory (correct for local[*] and tests), removed on JVM
  * exit. Datasets are written ONCE per (name, key) per JVM — query
  * re-construction reuses the materialized path instead of re-running
  * the write job — and land in a per-JVM unique subdirectory, so two
  * concurrent processes can never race an Overwrite against a reader.
  */
object Scratch {

  private val materialized =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Per-JVM unique discriminator under the (possibly shared) root. */
  private lazy val jvmTag =
    java.util.UUID.randomUUID().toString.take(8)

  private lazy val defaultRoot = {
    val d = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }))
    d.toString
  }

  def root(s: SparkSession): String =
    s.conf.getOption("spark.graft.scratch").getOrElse(defaultRoot)

  /** Build-and-cache: writes `build` under `root/name/jvmTag-<key#>`
    * the first time this (name, key) is requested in this JVM, and
    * returns the same path afterwards. */
  def materialize(s: SparkSession, name: String, key: String,
      write: (DataFrame, String) => Unit = (df, p) => IO.writeParquet(df, p))(
      build: => DataFrame): String =
    materialized.getOrElseUpdate(s"$name|$key", {
      val keyTag = Integer.toHexString(key.hashCode)
      val path = s"${root(s)}/$name/$jvmTag-$keyTag"
      write(build, path)
      path
    })
}
