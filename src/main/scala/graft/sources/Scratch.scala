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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  locally {
    // Priority above FileSystem.SHUTDOWN_HOOK_PRIORITY (10): our
    // deletes must run BEFORE Hadoop closes its cached FileSystems, or
    // shared-root cleanup silently races the FS-close hook.
    org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
      new Runnable {
        def run(): Unit = created.forEach { case (conf, path) =>
          try {
            val p = new org.apache.hadoop.fs.Path(path)
            val fs = p.getFileSystem(conf)
            // a registered subdir may already be gone via its root
            if (fs.exists(p) && !fs.delete(p, true))
              log.warn(s"scratch cleanup: delete returned false for $path")
          } catch {
            case e: Throwable =>
              log.warn(s"scratch cleanup: failed to delete $path: $e")
          }
        }
      },
      org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 10,
      // explicit generous timeout: the manager's default per-hook
      // budget (hadoop.service.shutdown.timeout, 30s) could cancel a
      // large fixture-tree delete mid-iteration and leak the rest
      5, java.util.concurrent.TimeUnit.MINUTES)
  }

  private lazy val defaultRoot = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scratch").toString
    // The root itself is ours (per-JVM temp) — register it so the whole
    // tree goes, not just the per-dataset UUID subdirs.
    created.add((new org.apache.hadoop.conf.Configuration(), dir))
    dir
  }

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
