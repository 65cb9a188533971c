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

    // Construction-only pass at the MEASURED dir: queries that
    // materialize an external fixture through the Scratch layer
    // (b18/b22/d45/d46) pay their one-time write at first construction
    // per (JVM, sf). Let that land HERE, outside the timed passes, so
    // their measured min AND spread both reflect the steady-state plan
    // (the fixture read-back) — otherwise pass 1 carries the write,
    // passes 2-3 don't, and the query gets a structural ~3x spread
    // that bench_compare would forever accept as noise cover for a
    // real regression. Plan construction is lazy for everything else,
    // so this costs seconds, not a fourth pass.
    SparkEntry.queries.foreach { case (name, f) =>
      try f(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] construction at bench SF $name failed: ${e.getMessage}")
      }
    }

    // three measured passes per query, min reported: the host is shared,
    // and a transient co-tenant spike during a single pass would be
    // indistinguishable from a plan regression. Each pass starts from a
    // cleared cache so operator-internal persists (d15/d35) can't be
    // silently substituted by the CacheManager — min-of-N times cold
    // plans, not cached reads.
    // a query that failed once reports -1 regardless of later passes —
    // skip its remaining passes instead of re-running a broken (and
    // possibly slow) plan twice more
    // Per-pass CALIBRATION probe: a fixed, SF-independent, CPU-bound
    // job timed at the start of each measured pass. Its work never
    // changes, so its three times are pure environment signal —
    // co-tenant load plus this JVM's own heap/GC state, exactly the
    // conditions the queries in the same window run under. A loaded
    // pass window becomes attributable from the artifact alone (the
    // r8 phantom-regression class), instead of being inferred from
    // per-query spreads after the fact.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 1L << 25, 1L, 32)
        .selectExpr("bit_xor(xxhash64(id)) AS h") // xor: overflow-free under ANSI
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // pay the probe's own JIT outside the recorded values

    val failed = scala.collection.mutable.Set[String]()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      if (failed(name)) return -1.0
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name; false
      }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // (min, relative spread (max-min)/min) per query — the spread is the
    // co-tenant-noise signal: unchanged code with a big spread is a noisy
    // window, not a plan regression. Passes are interleaved QUERY-MAJOR
    // (pass 1 over every query, then pass 2, then pass 3): back-to-back
    // passes of one query all sit inside the same co-tenant spike, so the
    // spike survives the min; spreading a query's passes ~minutes apart
    // makes a spike land in the spread instead.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val calib = scala.collection.mutable.ArrayBuffer[Double]()
    val passMatrix: Seq[Seq[Double]] = (1 to 3).map { _ =>
      calib += calibrate()
      named.map { case (name, fn) => timeOnce(name, fn) }
    }
    val results = named.zipWithIndex.map { case ((name, _), i) =>
      val passes = passMatrix.map(_(i))
      if (passes.exists(_ < 0)) name -> (-1.0, -1.0)
      else name -> (passes.min, (passes.max - passes.min) / math.max(passes.min, 1e-9))
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
    // Per-query timings as PARALLEL ARRAYS — ids space-joined in one
    // string, values as CENTISECOND ints (170 queries broke the old
    // "q01":1.234 map form: 2210 chars > the ~1920 usable window; the
    // array form costs ~8 chars/query, headroom for ~35 more). A
    // failed query records -100 (the old -1.0s). tools/bench_compare
    // `load()` reconstructs the seconds map from qk/qv_cs.
    val qk = shortIds.mkString("\"", " ", "\"")
    val qvCs = results.map(r => math.round(r._2._1 * 100))
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // Dispersion: median relative spread over all queries, plus as many
    // per-query spreads (noisiest first) as fit the line budget, with
    // "spread_floor" recording the largest EXCLUDED spread. The floor
    // turns absence into information: a query missing from spread_hi is
    // PROVEN to have spread <= spread_floor, so bench_compare can rule
    // its dispersion in or out exactly instead of falling back to the
    // suite median (which silently downgraded real regressions inside
    // broadly-noisy windows).
    val spreads = results.map(_._2._2).filter(_ >= 0).sorted
    val spreadMed =
      if (spreads.isEmpty) 0.0
      else if (spreads.size % 2 == 1) spreads(spreads.size / 2)
      else (spreads(spreads.size / 2 - 1) + spreads(spreads.size / 2)) / 2
    val bySpread = shortIds.zip(results.map(_._2._2))
      .filter(_._2 >= 0).sortBy(-_._2)
    val calibJson = calib.map(v => f"$v%.3f").mkString("[", ",", "]")
    val sfShort = new java.io.File(sfDir).getName
    def render(k: Int): String = {
      val hi = bySpread.take(k)
        .map { case (n, v) => "\"" + n + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")
      val floor = if (k < bySpread.size) bySpread(k)._2 else 0.0
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","qk":$qk,"qv_cs":$qvCs,"spread_med":$spreadMed%.3f,"spread_hi":$hi,"spread_floor":$floor%.2f,"calib":$calibJson,"sf":"$sfShort"}"""
    }
    // Largest spread set that still fits the ~2000-char tail capture;
    // worst case k=0 keeps the floor (= the max spread) as the bound.
    val line = (bySpread.size to 0 by -1).iterator.map(render)
      .find(_.length <= 1800)
      .getOrElse(sys.error(
        s"bench JSON line ${render(0).length} chars even without per-query spreads — would overflow the 2000-char tail capture"))
    println(line)
    spark.stop()
  }
}
