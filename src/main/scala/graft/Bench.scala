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

    // Per-query EXECUTOR TASK TIME (sum of task executorRunTime, ms),
    // captured alongside wall time: at a fixed-cost-dominated SF every
    // per-query wall time sits on the same ~0.3 s floor and the
    // 8c/32c wall ratio is ≈1, so wall time cannot demonstrate
    // parallel scaling — the summed task runtime is the signal that
    // DOES scale with work (r18 verdict #4). Recorded to the detail
    // file only; the stdout contract line is unchanged.
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) taskMs.addAndGet(e.taskMetrics.executorRunTime)
    })
    def taskMsNow(): Long = {
      // listener delivery is async — drain the bus so the counter has
      // seen every task of the job that just finished
      org.apache.spark.sql.graftbridge.GraftBridge.drainListenerBus(spark)
      taskMs.get()
    }
    val failed = scala.collection.mutable.Set[String]()
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      if (failed(name)) return (-1.0, -1L)
      spark.catalog.clearCache()
      val tm0 = taskMsNow()
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        failed += name; false
      }
      val wall = (System.nanoTime() - t0) / 1e9 // wall stops BEFORE the bus drain
      if (ok) (wall, taskMsNow() - tm0) else (-1.0, -1L)
    }
    // (min, relative spread (max-min)/min) per query — the spread is the
    // co-tenant-noise signal: unchanged code with a big spread is a noisy
    // window, not a plan regression. Passes are interleaved QUERY-MAJOR
    // (pass 1 over every query, then pass 2, then pass 3): back-to-back
    // passes of one query all sit inside the same co-tenant spike, so the
    // spike survives the min; spreading a query's passes ~minutes apart
    // makes a spike land in the spread instead.
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    def runPass(): (Double, Seq[(Double, Long)]) =
      (calibrate(), named.map { case (name, fn) => timeOnce(name, fn) })
    // Contaminated-pass retry: the calibration probe's work never
    // changes, so a pass whose probe lands >3× the run's median probe
    // ran under co-tenant load — its per-query times are inflated
    // floors that cost a cross-round adjudication every time (r14/r15/
    // r16 all paid it). Re-run such a pass (up to twice) and REPLACE
    // it, keeping the replaced probes in "calib_dropped" so the
    // artifact still shows the load was seen and excluded rather than
    // never measured. If two retries can't find a quiet window, accept
    // and say so ("calib_note") — an annotated noisy artifact beats an
    // unbounded bench.
    val passes = scala.collection.mutable.ArrayBuffer[(Double, Seq[(Double, Long)])]()
    (1 to 3).foreach(_ => passes += runPass())
    def calibMed = passes.map(_._1).sorted.apply(passes.size / 2)
    val droppedCalib = scala.collection.mutable.ArrayBuffer[Double]()
    var calibRetries = 0
    while (calibRetries < 2 && passes.map(_._1).max > 3 * calibMed) {
      val worst = passes.indexOf(passes.maxBy(_._1))
      droppedCalib += passes(worst)._1
      passes.remove(worst)
      calibRetries += 1
      passes += runPass()
    }
    val stillUneven = passes.map(_._1).max > 3 * calibMed
    val calib = passes.map(_._1)
    val passMatrix: Seq[Seq[Double]] = passes.toSeq.map(_._2.map(_._1))
    val taskMatrix: Seq[Seq[Long]] = passes.toSeq.map(_._2.map(_._2))
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
    // Per-query timings, round-14 compact form (the r12 parallel arrays
    // — qk space-joined ids + qv_cs centisecond ints — grew ~8.3
    // chars/query and would have overflowed the tail window again ~28
    // queries out):
    //   "qspec" — RANGE-COMPRESSED ids: consecutive same-family runs
    //   collapse to "b01-b43" (the §2 ids are contiguous by
    //   construction, so the whole suite is ~4 tokens at any size;
    //   a gap just splits the run — no correctness dependence on
    //   contiguity).
    //   "qv36"  — fixed-width 3-char base36 centiseconds, concatenated
    //   in qspec order (max 46655 cs = 466 s/query, clamped; failed =
    //   "___"). 3 chars/query flat, vs ~8.3 — headroom past 500
    //   queries.
    // tools/bench_compare `load()` reconstructs the seconds map from
    // qspec/qv36 (and still from qk/qv_cs and the legacy "queries" map,
    // so old artifacts diff unchanged).
    case class IdRun(fam: String, start: Int, end: Int, width: Int) {
      def render: String = {
        def pad(n: Int) = s"%0${width}d".format(n)
        if (start == end) s"$fam${pad(start)}" else s"$fam${pad(start)}-$fam${pad(end)}"
      }
    }
    val idRe = "^([a-z]+)([0-9]+)$".r
    val qspec = shortIds.foldLeft(List.empty[Either[String, IdRun]]) {
      case (acc, idRe(fam, num)) =>
        acc match {
          case Right(r) :: rest if r.fam == fam && num.length == r.width
              && num.toInt == r.end + 1 =>
            Right(r.copy(end = num.toInt)) :: rest
          case _ => Right(IdRun(fam, num.toInt, num.toInt, num.length)) :: acc
        }
      case (acc, other) => Left(other) :: acc // non-standard id: literal token
    }.reverse.map { case Right(r) => r.render; case Left(t) => t }
      .mkString("\"", " ", "\"")
    // "zzz" (= 46655) is the reserved CLAMPED sentinel: genuine times
    // encode at most "zzy" (466.54 s), so bench_compare can surface
    // ">=466.55s, clamped" instead of misreading a pathological
    // regression (e.g. 30 min) as exactly 466.55 s — the '___'
    // failed-marker idea applied to overflow.
    def base36cs(sec: Double): String =
      if (sec < 0) "___"
      else {
        val cs = math.round(sec * 100)
        if (cs >= 46655L) "zzz"
        else {
          val s = java.lang.Long.toString(cs, 36)
          "0" * (3 - s.length) + s
        }
      }
    val qv36 = results.map(r => base36cs(r._2._1)).mkString("\"", "", "\"")
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
    // retry bookkeeping: only present when a contaminated pass was
    // actually replaced (keeps the steady-state line minimal)
    val calibExtra =
      (if (calibRetries > 0)
        s""","calib_dropped":${droppedCalib.map(v => f"$v%.3f").mkString("[", ",", "]")}"""
      else "") +
      (if (stillUneven)
        s""","calib_note":"passes uneven after $calibRetries retries"""" else "")
    val sfShort = new java.io.File(sfDir).getName
    def render(k: Int): String = {
      val hi = bySpread.take(k)
        .map { case (n, v) => "\"" + n + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")
      val floor = if (k < bySpread.size) bySpread(k)._2 else 0.0
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","qspec":$qspec,"qv36":$qv36,"spread_med":$spreadMed%.3f,"spread_hi":$hi,"spread_floor":$floor%.2f,"calib":$calibJson$calibExtra,"sf":"$sfShort"}"""
    }
    // Largest spread set that still fits the ~2000-char tail capture;
    // worst case k=0 keeps the floor (= the max spread) as the bound.
    val line = (bySpread.size to 0 by -1).iterator.map(render)
      .find(_.length <= 1800)
      .getOrElse(sys.error(
        s"bench JSON line ${render(0).length} chars even without per-query spreads — would overflow the 2000-char tail capture"))
    println(line)
    // FULL per-query detail file (r19): the stdout line's compact qv36
    // form is driver-contract-bound to the ~2000-char tail window and
    // the driver's loader does not decode it (PERF_r18.per_query was
    // empty) — so ALSO write the uncompressed per-query map, plus the
    // per-pass wall seconds and executor task-time ms (the quantity
    // that scales with work where wall time sits on the fixed floor),
    // to a side file. Path from SPARK_GRAFT_BENCH_OUT, default
    // BENCH_DETAIL.json in the cwd. stdout stays byte-compatible.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_DETAIL.json")
    try {
      val qjson = named.zipWithIndex.map { case ((name, _), i) =>
        val walls = passMatrix.map(_(i)).map(v => f"$v%.3f").mkString("[", ",", "]")
        val tms = taskMatrix.map(_(i)).mkString("[", ",", "]")
        val (mn, spread) = results(i)._2
        "\"" + name + "\":{" +
          f""""sec":$mn%.3f,"spread":$spread%.3f,"wall_s":$walls,"task_ms":$tms}"""
      }.mkString("{", ",", "}")
      val detail =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfShort","cpus":$cpus,"calib":$calibJson,"queries":$qjson}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        (detail + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] detail file $detailPath write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
