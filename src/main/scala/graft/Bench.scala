package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query at the SF dir given by
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall
  * seconds. A noop sink forces full materialization (count() would let
  * Catalyst prune the work being measured). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup: run EVERY query once at the smallest SF so
    // measured times reflect steady-state execution (JIT, codegen
    // compilation and classloading all paid up front) — a single-query
    // warmup leaves the first join-heavy queries paying multi-second
    // one-off JIT costs that show up as phantom regressions. Falls back
    // to the bench SF itself when the small fixture is absent; warmup
    // failures are reported, and fatal VM errors propagate.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    SparkEntry.queries.foreach { case (name, f) =>
      try f(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    // two measured passes per query, min reported: the host is shared,
    // and a transient co-tenant spike during a single pass would be
    // indistinguishable from a plan regression
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val a = timeOnce(name, fn)
      val b = if (a >= 0) timeOnce(name, fn) else -1.0
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    // The harness captures only the LAST ~2000 chars of stdout, and sbt
    // appends a ~76-char "[success]" line after ours — at 80+ queries the
    // full-name form overflows that window and the whole line is lost
    // (round 5's bench recorded parsed=null). Key the per-query map by the
    // short id prefix (b01, d24, q01, s01 — unique by construction, the
    // SURVEY §2 row ids) so the line stays well under the window at any
    // future query count.
    val shortIds = results.map(_._1.takeWhile(_ != '_'))
    require(shortIds.distinct.size == shortIds.size,
      "short query ids collide — two SURVEY ids share a prefix")
    val qs = shortIds.zip(results.map(_._2)).map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    require(line.length <= 1800,
      s"bench JSON line ${line.length} chars — would overflow the 2000-char tail capture")
    println(line)
    spark.stop()
  }
}
