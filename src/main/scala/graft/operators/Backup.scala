package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.model.BackupLedger
import graft.model.BackupLedger.{ledger, manifest, snapshots}

/** §2.B — esop-domain operators over the backup ledger.
  *
  * Each query is the Spark re-expression of one esop operation (cited
  * per entry); all are single declarative plans over
  * [[graft.model.BackupLedger]], so at 100 TB they inherit the scan's
  * pushdown and AQE's runtime re-partitioning. Windows partition by
  * bounded keys (node, snapshot×key); nothing collects to the driver.
  */
object Backup {

  private val cte = BackupLedger.oracleCte

  // ---- shared deterministic models (b15/b16/b20) -------------------

  /** The node's 8-vnode token list, built ONCE per row (`toks`); the
    * restore target's list replaces token 0 for node%5==0. Both the
    * backup and target sorted-list md5s derive from this one array —
    * r3 evaluated all 8 md5-derived tokens twice per row from scratch,
    * making b15 the slowest §2.B query. */
  private val tokenArraySpark: String =
    "transform(sequence(0, 7), i -> CAST(conv(substr(md5(concat('tok', CAST(node_id AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS LONG))"
  private val targetTokensSpark: String =
    "CASE WHEN node_id % 5 = 0 THEN concat(array(CAST(conv(substr(md5(concat('moved', CAST(node_id AS STRING))), 1, 8), 16, 10) AS LONG)), slice(toks, 2, 7)) ELSE toks END"
  private def sortedListHash(arr: String): String =
    s"md5(concat_ws(',', transform(array_sort($arr), x -> CAST(x AS STRING))))"

  /** DuckDB twin of [[tokenHashSpark]] — hash members come from the
    * single shared [[graft.model.Corpus.hash32Sql]] definition. */
  private def tokenHashDuck(target: Boolean): String = {
    val tok = graft.model.Corpus.hash32Sql(
      "concat('tok', CAST(node_id AS VARCHAR), '_', CAST(i AS VARCHAR))")
    val moved = graft.model.Corpus.hash32Sql(
      "concat('moved', CAST(node_id AS VARCHAR))")
    val elem = if (target) s"CASE WHEN node_id % 5 = 0 AND i = 0 THEN $moved ELSE $tok END" else tok
    s"md5(array_to_string(list_transform(list_sort(list_transform(range(0, 8), i -> $elem)), x -> CAST(x AS VARCHAR)), ','))"
  }

  /** Per-(node, snapshot) schema version: weekly rolls, node%7==0 lags
    * a week (mirrors ClusterSchemaVersions disagreement). */
  private val schemaVerSpark: String = {
    val wk = "(datediff(snapshot_day, DATE '2020-01-01') div 7)"
    s"concat('v', substr(md5(concat('schema', CAST(CASE WHEN node_id % 7 = 0 THEN $wk - 1 ELSE $wk END AS STRING))), 1, 6))"
  }

  private val schemaVerDuck: String =
    """concat('v', substr(md5(concat('schema',
      |      CAST(CASE WHEN node_id % 7 = 0
      |           THEN (date_diff('day', DATE '2020-01-01', snapshot_day) // 7) - 1
      |           ELSE date_diff('day', DATE '2020-01-01', snapshot_day) // 7
      |      END AS VARCHAR))), 1, 6))""".stripMargin

  /** Per-(node, snapshot_day) gossip state — the fleet-liveness
    * FIXTURE behind b44/b34: esop gates every operation on cluster
    * health (`impl/interaction/ClusterState.java:19-29` — no
    * joining/leaving/moving/unreachable nodes — and
    * `FailureDetector.java:18-25` — down endpoint count must be 0);
    * the ledger has no gossip feed, so the state is an md5-derived
    * 20-sided die per node-day: faces 0–3 = JOINING/LEAVING/MOVING/
    * DOWN, the other 16 NORMAL (~80% up — both fleet verdicts occur
    * at any fixture size). Same expression in both engines. */
  private val gossipNumSpark: String =
    "CAST(conv(substr(md5(concat('gossip', CAST(node_id AS STRING), '_', CAST(snapshot_day AS STRING))), 1, 8), 16, 10) AS LONG) % 20"
  private val gossipStateSpark: String =
    s"CASE ($gossipNumSpark) WHEN 0 THEN 'JOINING' WHEN 1 THEN 'LEAVING' " +
      "WHEN 2 THEN 'MOVING' WHEN 3 THEN 'DOWN' ELSE 'NORMAL' END"
  private val gossipNumDuck: String =
    "CAST(concat('0x', substr(md5(concat('gossip', CAST(node_id AS VARCHAR), '_', CAST(snapshot_day AS VARCHAR))), 1, 8)) AS BIGINT) % 20"
  private val gossipStateDuck: String =
    s"CASE ($gossipNumDuck) WHEN 0 THEN 'JOINING' WHEN 1 THEN 'LEAVING' " +
      "WHEN 2 THEN 'MOVING' WHEN 3 THEN 'DOWN' ELSE 'NORMAL' END"

  /** b34's plan body, parameterized on the liveness signal so the
    * "every node non-NORMAL" fleet shape is testable (the fixture's
    * md5 die never rolls an all-down day): `nodeUp` defaults to the
    * gossip state the ledger derives (b44's per-node view). Kept
    * `private[graft]` for OperatorSpec's forced-liveness edge case. */
  private[graft] def restorePlan(s: SparkSession, dir: String): DataFrame =
    restorePlan(s, dir, expr(gossipStateSpark) === "NORMAL")

  private[graft] def restorePlan(s: SparkSession, dir: String,
      nodeUp: Column): DataFrame = {
    val cut = lit("2024-01-12").cast("date")
    val m = manifest(s, dir)
    val resolved = m.filter(col("snapshot_day") <= cut)
      .groupBy("node_id").agg(max("snapshot_day").as("snapshot_day"))
    val slice = m.join(broadcast(resolved), Seq("node_id", "snapshot_day"))
    // b33's dealing over the resolved slice → per-node makespan
    val wRank = Window.partitionBy("node_id")
      .orderBy(col("size").desc, col("object_key"))
    // the hash gate RIDES the dealing pass (mismatches counted per
    // worker group, summed in the rollup) — a separate gate agg
    // would be a second full slice evaluation (measured: 5 events
    // scans instead of 3)
    val sched = slice
      .withColumn("worker", ((row_number().over(wRank) - 1) % 4).cast("int"))
      .groupBy("node_id", "snapshot_day", "worker")
      .agg(count(lit(1)).as("nf"), sum(col("size")).as("b"),
        count(when(col("upload_hash") =!= col("download_hash"), 1)).as("nm"))
      .withColumn("w_sec", ceil(asDouble(col("b")) / 25.0).cast("long"))
      .groupBy("node_id", "snapshot_day")
      .agg(sum(col("nf")).as("n_files"),
        asDouble(sum(col("b"))).as("bytes"),
        max(col("w_sec")).as("makespan_sec"),
        sum(col("nm")).as("n_hash_mismatch"))
    // token + schema gates from ONE bounded snapshots pass
    val snap = snapshots(s, dir)
      .withColumn("toks", expr(tokenArraySpark))
      .withColumn("bh", expr(sortedListHash("toks")))
      .withColumn("th", expr(sortedListHash(targetTokensSpark)))
      .withColumn("sv", expr(schemaVerSpark))
    // schema gate, PER-NODE actionable form: where b20 reports the
    // strict cluster-wide agreement (which the laggard fixture
    // fails on every day — a plan that never schedules anything),
    // the restore plan proceeds on nodes matching the day's
    // MAJORITY version and excludes the laggards — esop's in-place
    // restore is per-node; schema stragglers are skipped, not
    // fleet-blocking. Majority + version count both ride day
    // windows over the SAME bounded pass (a separate countDistinct
    // agg + join-back would evaluate the snapshots derivation
    // twice — measured: 4 events scans, not 3). Majority tie-break:
    // max(struct(count, sv)) ≡ ORDER BY count DESC, sv DESC.
    val wDay = Window.partitionBy("snapshot_day")
    val wDaySv = Window.partitionBy("snapshot_day", "sv")
    // liveness gate (ClusterState/FailureDetector, the b44 state)
    // follows the schema-laggard convention: a non-NORMAL node
    // excludes exactly ITSELF from the plan — esop's in-place
    // restore is per-node, so a down node is skipped, not
    // fleet-blocking. Rides the same bounded snapshots pass as the
    // token/schema gates (no extra scan). The reference's STRICTER
    // fleet-wide all-clear (ClusterState.java:21-26 — any non-NORMAL
    // node anywhere aborts the whole operation) is carried alongside
    // as the INFORMATIONAL fleet_ready column (b44's conjunction over
    // the resolved day): the plan tells the operator both "which nodes
    // can proceed" and "would esop have operated at all today" —
    // the deviation is visible in every row, not a silent relaxation.
    val gates = snap.select(col("node_id"), col("snapshot_day"),
        (col("bh") === col("th")).as("tokens_match"), col("sv"),
        nodeUp.as("node_up"))
      .withColumn("sv_cnt", count(lit(1)).over(wDaySv))
      .withColumn("n_versions",
        size(collect_set(col("sv")).over(wDay)).cast("long"))
      .withColumn("maj_sv",
        max(struct(col("sv_cnt"), col("sv"))).over(wDay).getField("sv"))
      .withColumn("schema_ok", col("sv") === col("maj_sv"))
      .withColumn("fleet_ready",
        count(when(!col("node_up"), 1)).over(wDay) === 0)
    sched
      .join(gates, Seq("node_id", "snapshot_day"))
      .withColumn("ready",
        col("n_hash_mismatch") === 0 && col("tokens_match")
          && col("schema_ok") && col("node_up"))
      .select(col("node_id"), col("snapshot_day"), col("n_files"),
        col("bytes"), col("n_hash_mismatch"), col("tokens_match"),
        col("n_versions"), col("schema_ok"), col("node_up"),
        col("fleet_ready"), col("ready"),
        when(col("ready"), col("makespan_sec")).as("makespan_sec"))
      .orderBy("node_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // esop `AllManifestsReport.report` (Manifest.java:595-700):
    // per-backup file count / size / node coverage, newest first.
    // Two-phase: pre-aggregate per (snapshot, node, entity) first so
    // the multi-countDistinct Expand runs over the reduced set (days ×
    // nodes × entities), not the full manifest — at 100 TB the Expand
    // over raw entries would triple the dominant shuffle.
    "b01_manifest_list" -> { (s, dir) =>
      manifest(s, dir)
        .groupBy("snapshot_day", "node_id", "keyspace", "table_name")
        .agg(count(lit(1)).as("cnt"), sum(col("size")).as("sz"))
        .groupBy("snapshot_day")
        .agg(
          sum(col("cnt")).as("n_files"),
          asDouble(sum(col("sz"))).as("total_size"),
          countDistinct(col("node_id")).as("n_nodes"),
          countDistinct(concat_ws(".", col("keyspace"), col("table_name"))).as("n_tables"))
        .orderBy(col("snapshot_day").desc)
    },

    // esop `ListOperation.filterLastN` (ListOperation.java:181-198):
    // last 3 backups per node via a per-node window (bounded partitions).
    "b02_list_lastn" -> { (s, dir) =>
      val w = Window.partitionBy("node_id").orderBy(col("snapshot_day").desc)
      snapshots(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("node_id", "snapshot_day", "rn")
        .orderBy("node_id", "rn")
    },

    // esop `ListOperation.filterFromTimestamp` (ListOperation.java:167-179).
    "b03_list_from_ts" -> { (s, dir) =>
      manifest(s, dir)
        .filter(col("snapshot_day") <= lit("2024-01-20").cast("date"))
        .groupBy("snapshot_day")
        .agg(count(lit(1)).as("n_files"), asDouble(sum(col("size"))).as("total_size"))
        .orderBy(col("snapshot_day").desc)
    },

    // esop incremental backup (Backuper FRESH vs ALREADY_PRESENT): keys
    // in snapshot S never uploaded before S → left-anti join on object_key.
    "b04_snapshot_diff" -> { (s, dir) =>
      val m = manifest(s, dir)
      val day = lit("2024-01-10").cast("date")
      val current = m.filter(col("snapshot_day") === day)
      val prior = m.filter(col("snapshot_day") < day)
        .select("object_key").distinct()
      current.join(prior, Seq("object_key"), "left_anti")
        .select(col("object_key"), col("keyspace"), col("table_name"),
          col("node_id"), asDouble(col("size")).as("size"))
        .orderBy("object_key")
    },

    // esop reclaimable space (Manifest.java:461-483): bytes referenced by
    // exactly one manifest. Ref-counts via a per-key window over the
    // SAME manifest pass — a groupBy+self-join would compute the
    // manifest dedupe (the biggest shuffle here) twice at 100 TB.
    "b05_reclaimable" -> { (s, dir) =>
      val w = Window.partitionBy("object_key")
      manifest(s, dir)
        .withColumn("n_refs", count(lit(1)).over(w))
        .groupBy("snapshot_day")
        .agg(
          asDouble(coalesce(sum(when(col("n_refs") === 1, col("size"))), lit(0).cast("decimal(18,2)"))).as("reclaimable"),
          count(when(col("n_refs") === 1, lit(1))).as("n_removable"))
        .orderBy("snapshot_day")
    },

    // Replica-spread audit — esop's topology concern asked of the data
    // itself (`impl/CassandraClusterTopology` records the ring; this
    // checks the BACKUP actually spans it): per logical sstable
    // (keyspace/table/sst number, node prefix stripped), how many
    // distinct nodes hold a copy in the LATEST snapshot, and which
    // fall below RF=2. The latest day is a 1-row partial-agg max
    // broadcast into the join (never a global window over the
    // manifest), and the rollup groups the bounded (ks, tab, sst) key
    // space — at 100 TB this is one manifest pass + one bounded agg.
    "b40_replica_spread" -> { (s, dir) =>
      val m = manifest(s, dir)
      val latest = m.agg(max(col("snapshot_day")).as("latest_day"))
      m.join(broadcast(latest), col("snapshot_day") === col("latest_day"))
        .withColumn("sst",
          regexp_extract(col("object_key"), "sst_([0-9]+)$", 1).cast("long"))
        .groupBy("keyspace", "table_name", "sst")
        .agg(countDistinct(col("node_id")).as("n_replicas"),
          asDouble(sum(col("size"))).as("total_size"))
        .withColumn("under_replicated", col("n_replicas") < 2)
        .orderBy("keyspace", "table_name", "sst")
    },

    // Retention-policy WHAT-IF curve — b05/b06/b37 decide under ONE
    // policy; this prices the policy space before an operator picks
    // one (the d71 threshold-curve idea on the backup side): for
    // keep-last-k ∈ {1,2,3,5}, how many physical objects become
    // deletable under esop's shared-file rule (an object dies only
    // when EVERY referencing snapshot is removed — min over its
    // snapshots' recency ranks > k) and how many bytes return. Ranks
    // come from the BOUNDED snapshots frame (broadcast into the
    // manifest pass), per-object stats compute ONCE, and the 4-point
    // sweep is a bounded explode over the per-object frame — the
    // manifest is never re-scanned per policy.
    "b41_retention_curve" -> { (s, dir) =>
      val rankW = Window.partitionBy("node_id").orderBy(col("snapshot_day").desc)
      val snapRank = snapshots(s, dir).withColumn("rk", row_number().over(rankW))
      val objStats = manifest(s, dir)
        .join(broadcast(snapRank), Seq("node_id", "snapshot_day"))
        .groupBy("object_key")
        .agg(min(col("rk")).as("min_rk"),
          min_by(col("size"), col("rk")).as("latest_size"))
      objStats
        .select(col("min_rk"), col("latest_size"),
          explode(array(lit(1), lit(2), lit(3), lit(5))).as("keep_last"))
        .groupBy("keep_last")
        .agg(
          count(when(col("min_rk") > col("keep_last"), lit(1))).as("n_reclaimable"),
          asDouble(coalesce(
            sum(when(col("min_rk") > col("keep_last"), col("latest_size"))),
            lit(0).cast("decimal(18,2)"))).as("reclaim_bytes"))
        .orderBy("keep_last")
    },

    // Storage-class TIERING plan — the S3 lifecycle policy an operator
    // attaches to the backup bucket, computed from the ledger itself
    // (esop stores to object storage, `impl/s3/*`; tiering stale
    // objects to cold classes is where a 100 TB backup's bill
    // actually goes): per object, staleness = days since its LAST
    // referencing snapshot relative to the ledger head; <3d hot,
    // <10d warm, else cold (cold-and-unreferenced is also b37's GC
    // candidate set — tiering prices what retention hasn't yet
    // deleted). One manifest pass folds to per-object stats (max day
    // + arg-max current size), the head day is a broadcast 1-row max,
    // and the rollup groups (keyspace, tier) — bounded output.
    "b42_storage_tiering" -> { (s, dir) =>
      val m = manifest(s, dir)
      val obj = m.groupBy("object_key", "keyspace")
        .agg(max(col("snapshot_day")).as("last_day"),
          max_by(col("size"), col("snapshot_day")).as("cur_size"))
      val head = m.agg(max(col("snapshot_day")).as("latest_day"))
      obj.crossJoin(broadcast(head))
        .withColumn("staleness", datediff(col("latest_day"), col("last_day")))
        .withColumn("tier",
          when(col("staleness") < 3, "hot")
            .when(col("staleness") < 10, "warm")
            .otherwise("cold"))
        .groupBy("keyspace", "tier")
        .agg(count(lit(1)).as("n_objects"),
          asDouble(sum(col("cur_size"))).as("total_size"))
        .orderBy("keyspace", "tier")
    },

    // Snapshot COMPLETENESS gate — the presence check esop's restore
    // makes before touching any data file (the manifest document and
    // the CQL schema are downloaded FIRST; a snapshot missing either
    // is unrestorable regardless of its data files —
    // `impl/restore/RestorationUtils` fetches manifest + schema up
    // front): per (node, snapshot), file counts by type and the
    // restorable verdict. One manifest pass into a bounded
    // (node × day) aggregate — b20 gates CONTENT (hashes, tokens,
    // schema agreement); this gates EXISTENCE, the cheaper first
    // filter a restore planner applies.
    "b43_snapshot_completeness" -> { (s, dir) =>
      manifest(s, dir)
        .groupBy("node_id", "snapshot_day")
        .agg(count(lit(1)).as("n_files"),
          count(when(col("ftype") === "MANIFEST_FILE", 1)).as("n_manifest"),
          count(when(col("ftype") === "CQL_SCHEMA", 1)).as("n_schema"),
          count(when(col("ftype") === "COMMIT_LOG", 1)).as("n_commitlog"))
        .withColumn("complete", col("n_manifest") > 0 && col("n_schema") > 0)
        .orderBy("node_id", "snapshot_day")
    },

    // Fleet-liveness gate — the pre-operation health check esop runs
    // before touching data: ClusterState.act()
    // (impl/interaction/ClusterState.java:19-29) demands no
    // joining/leaving/moving/unreachable node anywhere in the fleet,
    // and the FailureDetector (FailureDetector.java:18-25) reports
    // the down-endpoint count. Per (day, node): the gossip state and
    // up flag; per day: the four transition counts, the down count
    // and the all-clear fleet verdict — every aggregate a window over
    // the bounded (day × node) snapshot table (one 2-column ledger
    // distinct, no second scan). b34 composes the same state
    // per-node; this is the fleet-wide dashboard form.
    "b44_fleet_liveness" -> { (s, dir) =>
      val wDay = Window.partitionBy("snapshot_day")
      snapshots(s, dir)
        .withColumn("state", expr(gossipStateSpark))
        .withColumn("node_up", col("state") === "NORMAL")
        .withColumn("n_joining",
          count(when(col("state") === "JOINING", 1)).over(wDay))
        .withColumn("n_leaving",
          count(when(col("state") === "LEAVING", 1)).over(wDay))
        .withColumn("n_moving",
          count(when(col("state") === "MOVING", 1)).over(wDay))
        .withColumn("n_down",
          count(when(col("state") === "DOWN", 1)).over(wDay))
        .withColumn("fleet_ready",
          col("n_joining") === 0 && col("n_leaving") === 0
            && col("n_moving") === 0 && col("n_down") === 0)
        .select("snapshot_day", "node_id", "state", "node_up",
          "n_joining", "n_leaving", "n_moving", "n_down", "fleet_ready")
        .orderBy("snapshot_day", "node_id")
    },

    // Backup-cadence plan — the forward-looking twin of b38's streak
    // report, modeling esop's fixed-rate snapshot daemon
    // (scheduling/DaemonScheduler.java:52-66: scheduleAtFixedRate +
    // "Operation will be next executed at <last + rate>"): at the
    // daemon's daily rate, each node OWES one backup per day of its
    // active window. Per node: observed first/last day, actual vs
    // expected run counts, missed days, adherence, the daemon's
    // next-due day (last + rate) and the overdue verdict. "Now" is
    // the AUDIT day = fleet's latest observed day + 1 (the dashboard
    // runs the morning after the newest backup anywhere in the store
    // — a ledger has no wall clock): a node current through the head
    // day is due-today, not overdue; every node behind the head owes
    // exactly (head − last) days. One 2-column snapshots distinct
    // into a per-node aggregate; the fleet head rides a single-row
    // broadcast fold (the assignTop2 convention), never a corpus
    // window.
    "b45_backup_cadence" -> { (s, dir) =>
      val perNode = snapshots(s, dir)
        .groupBy("node_id")
        .agg(min("snapshot_day").as("first_day"),
          max("snapshot_day").as("last_day"),
          count(lit(1)).as("n_runs"))
      val fleetHead = perNode.agg(max("last_day").as("fleet_latest"))
      perNode
        .crossJoin(broadcast(fleetHead))
        .withColumn("audit_day", date_add(col("fleet_latest"), 1))
        .withColumn("n_expected",
          (datediff(col("last_day"), col("first_day")) + 1).cast("long"))
        .withColumn("n_missed", col("n_expected") - col("n_runs"))
        .withColumn("adherence",
          col("n_runs").cast("double") / col("n_expected").cast("double"))
        .withColumn("next_due", date_add(col("last_day"), 1))
        // days PAST the due day as of the audit morning ("due today"
        // is not overdue): last = head ⇒ 0; last = head-2 ⇒ 2 over
        .withColumn("overdue_days",
          greatest(datediff(col("audit_day"), col("next_due")), lit(0))
            .cast("long"))
        .withColumn("overdue", col("overdue_days") > 0)
        .select("node_id", "first_day", "last_day", "n_runs", "n_expected",
          "n_missed", "adherence", "next_due", "audit_day",
          "overdue_days", "overdue")
        .orderBy("node_id")
    },

    // Retry-budget plan — the operational twin of b21's bandwidth
    // plan, pricing esop's retry machinery (impl/retry/Retrier.java:
    // 87-121 — LinearSleeper sleeps a fixed interval per attempt,
    // ExponentialSleeper doubles it; impl/retry/RetrySpec.java:18-33 —
    // defaults interval=10s, maxAttempts=3): per (node, snapshot_day),
    // how much WALL TIME does upload flakiness add to the day's backup
    // in the worst case? Each hash-mismatched upload (b08's failure
    // set) is one retry loop of up to maxAttempts attempts: sleep
    // budget 10·3=30s linear / 10·(2³−1)=70s exponential, plus the
    // retransfer seconds for re-uploading the failed bytes maxAttempts
    // times at b21's 25-units/s rate — all against the day's NOMINAL
    // transfer time, so overhead is comparable across days. ONE
    // manifest pass (conditional aggs carry the failed minority —
    // no second scan, no join; pin events=1); bounded (node × day)
    // output; exact integer/decimal arithmetic throughout.
    "b46_retry_budget" -> { (s, dir) =>
      val interval = 10L; val maxAttempts = 3L
      manifest(s, dir)
        .groupBy("node_id", "snapshot_day")
        .agg(count(lit(1)).as("n_files"),
          count(when(col("upload_hash") =!= col("download_hash"), 1))
            .as("n_failed"),
          sum(col("size")).as("sz"),
          coalesce(sum(when(col("upload_hash") =!= col("download_hash"),
            col("size"))), lit(0).cast("decimal(18,2)")).as("fsz"))
        .withColumn("nominal_sec", ceil(asDouble(col("sz")) / 25.0).cast("long"))
        .withColumn("sleep_linear_sec",
          col("n_failed") * lit(interval * maxAttempts))
        .withColumn("sleep_exp_sec",
          col("n_failed") * lit(interval * ((1L << maxAttempts.toInt) - 1)))
        .withColumn("retransfer_sec",
          ceil(asDouble(col("fsz")) * maxAttempts / 25.0).cast("long"))
        .withColumn("worst_total_sec",
          col("nominal_sec") + col("sleep_exp_sec") + col("retransfer_sec"))
        .withColumn("overhead_pct",
          (col("sleep_exp_sec") + col("retransfer_sec")).cast("double") * 100.0
            / col("nominal_sec").cast("double"))
        .select(col("node_id"), col("snapshot_day"), col("n_files"),
          col("n_failed"), asDouble(col("fsz")).as("failed_bytes"),
          col("nominal_sec"), col("sleep_linear_sec"), col("sleep_exp_sec"),
          col("retransfer_sec"), col("worst_total_sec"), col("overhead_pct"))
        .orderBy("node_id", "snapshot_day")
    },

    // esop `RemoveBackupOperation` olderThan (RemoveBackupOperation.java:184-186).
    "b06_retention" -> { (s, dir) =>
      manifest(s, dir)
        .filter(col("snapshot_day") < lit("2024-01-08").cast("date"))
        .groupBy("snapshot_day")
        .agg(count(lit(1)).as("n_files"), asDouble(sum(col("size"))).as("total_size"))
        .orderBy("snapshot_day")
    },

    // esop PIT commit-log replay: final state = last write per (node, key)
    // with ts ≤ T (impl/restore/CommitLogRestorationStrategy).
    "b07_pit_state" -> { (s, dir) =>
      val w = Window.partitionBy("node_id", "k")
        .orderBy(col("ts").desc, col("event_id").desc)
      ledger(s, dir)
        .filter(col("ts") <= lit("2024-01-15 12:00:00").cast("timestamp"))
        .withColumn("k", regexp_extract(col("props"), "([0-9]+)", 1))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node_id"), col("k"), col("event_id"),
          asDouble(col("size")).as("size"))
        .orderBy("node_id", "k")
    },

    // esop hash verification (impl/hash/HashServiceImpl.java): entries
    // whose download hash disagrees with the manifest hash.
    "b08_hash_verify" -> { (s, dir) =>
      manifest(s, dir)
        .filter(col("upload_hash") =!= col("download_hash"))
        .select("snapshot_day", "object_key", "node_id", "upload_hash", "download_hash")
        .orderBy("snapshot_day", "object_key")
    },

    // esop S3 multipart planning (impl/backup/Backuper.java): parts =
    // ceil(size/chunk), rolled up per node.
    "b09_chunking" -> { (s, dir) =>
      manifest(s, dir)
        .withColumn("parts",
          greatest(lit(1L), ceil(asDouble(col("size")) / 10.0).cast("long")))
        .groupBy("node_id")
        .agg(
          sum(col("parts")).as("total_parts"),
          count(lit(1)).as("n_files"),
          asDouble(sum(col("size"))).as("total_size"))
        .orderBy("node_id")
    },

    // esop topology (topology/CassandraSimpleTopology.java): cluster→DC→node
    // counts; DC derived deterministically from the node id.
    "b10_topology" -> { (s, dir) =>
      ledger(s, dir)
        .withColumn("dc", concat(lit("dc"), (col("node_id") % 3).cast("string")))
        .groupBy("dc")
        .agg(
          countDistinct(col("node_id")).as("n_nodes"),
          count(lit(1)).as("n_entries"),
          asDouble(sum(col("size"))).as("total_size"))
        .orderBy("dc")
    },

    // esop restore-under-different-name (impl/RenamedEntities.java):
    // entity-level rename — the keyspace path segment is rewritten to
    // its restore target, exactly what `--rename ks=ks_restored` does.
    "b11_table_rename" -> { (s, dir) =>
      manifest(s, dir)
        .filter(col("snapshot_day") === lit("2024-01-10").cast("date"))
        .select(
          col("object_key"),
          col("keyspace"),
          col("table_name"),
          expr("replace(object_key, concat('/', keyspace, '/'), concat('/', keyspace, '_restored/'))")
            .as("renamed_key"),
          col("node_id"),
          asDouble(col("size")).as("size"))
        .orderBy("object_key")
    },

    // esop remove-oldest (RemoveBackupOperation.java:170-200, the
    // "oldest" selector): the oldest backup's entries, each flagged
    // deletable when no other snapshot references its key (same
    // ref-count window as b05, ONE manifest pass + a broadcast scalar —
    // the scalar comes off the raw ledger, whose day set is identical,
    // so the manifest dedupe window never runs twice).
    "b13_remove_oldest" -> { (s, dir) =>
      val w = Window.partitionBy("object_key")
      val m = manifest(s, dir).withColumn("n_refs", count(lit(1)).over(w))
      val oldest = ledger(s, dir).agg(min(col("snapshot_day")).as("oldest_day"))
      m.join(broadcast(oldest), m("snapshot_day") === oldest("oldest_day"))
        .select(
          col("object_key"), col("node_id"),
          asDouble(col("size")).as("size"),
          when(col("n_refs") === 1, 1).otherwise(0).as("deletable"))
        .orderBy("object_key")
    },

    // esop entity filtering (`DatabaseEntities.forTakingSnapshot`,
    // impl/DatabaseEntities.java:121): operations scoped to an
    // `--entities ks.tab,...` list — per-entity per-snapshot report.
    // The filter is a pushed-down IN over the derived entity column;
    // at 100 TB it prunes at the scan before any shuffle.
    "b14_entities_filter" -> { (s, dir) =>
      val wanted = Seq("ks0.tab1", "ks1.tab3", "ks2.tab5")
      manifest(s, dir)
        .withColumn("entity", concat_ws(".", col("keyspace"), col("table_name")))
        .filter(col("entity").isin(wanted: _*))
        .groupBy("entity", "snapshot_day")
        .agg(count(lit(1)).as("n_files"), asDouble(sum(col("size"))).as("total_size"))
        .orderBy("entity", "snapshot_day")
    },

    // esop remote-inventory diff (`impl/BucketService.java`,
    // `impl/RemoteObjectReference.java`, the s3/azure/gcp Restorer.list
    // impls): the incremental path diffs against the ACTUAL remote
    // bucket listing, not the backup's own history. The listing here is
    // an external source — written and read back through the IO layer
    // (the shape an S3 Inventory parquet manifest arrives in) — then
    // left-anti-joined by the current snapshot. At 100 TB the inventory
    // scan is columnar on one key column and the anti-join shuffles
    // only (object_key); phantom remote objects (never uploaded by us)
    // are simply never matched.
    "b18_remote_inventory" -> { (s, dir) =>
      val day = lit("2024-01-10").cast("date")
      val listing = ledger(s, dir)
        .filter(col("snapshot_day") < day && col("event_id") % 3 =!= 0)
        .select("object_key").distinct()
        .unionAll(s.range(0, 5).select(
          concat(lit("phantom/obj_"), col("id").cast("string")).as("object_key")))
      // materialized ONCE per (JVM, sf dir) through the shared scratch
      // layer — on a cluster spark.graft.scratch points at a shared FS
      // so executors can read it; re-constructions reuse the dataset
      // instead of re-running the write job (bench measures the query,
      // not the fixture build)
      val invPath = graft.sources.Scratch.materialize(
        s, "graft_remote_inventory", dir)(listing)
      val remote = graft.sources.IO.readParquet(s, invPath)
      manifest(s, dir)
        .filter(col("snapshot_day") === day)
        .join(remote, Seq("object_key"), "left_anti")
        .select(col("object_key"), col("keyspace"), col("table_name"),
          col("node_id"), asDouble(col("size")).as("size"))
        .orderBy("object_key")
    },

    // esop token-ring consistency check (`Manifest.hasSameTokens`,
    // impl/Manifest.java:114-118; interaction/CassandraSameTokens.java):
    // a restore proceeds only if the target node's token list equals
    // the backup's. Token lists are bounded per node (vnodes), so the
    // set-equality is a sorted-list md5 comparison — one per-row
    // projection over snapshots, no shuffle. Node ids divisible by 5
    // have "moved" (one token replaced) to exercise the mismatch path.
    "b15_token_check" -> { (s, dir) =>
      snapshots(s, dir)
        .withColumn("toks", expr(tokenArraySpark))
        .withColumn("backup_hash", expr(sortedListHash("toks")))
        .withColumn("target_hash", expr(sortedListHash(targetTokensSpark)))
        .withColumn("tokens_match",
          when(col("backup_hash") === col("target_hash"), 1).otherwise(0))
        .select("node_id", "snapshot_day", "backup_hash", "target_hash", "tokens_match")
        .orderBy("node_id", "snapshot_day")
    },

    // esop schema-version agreement (interaction/ClusterSchemaVersions
    // .java, CassandraSchemaVersion.java; Manifest.schemaVersion at
    // Manifest.java:221): a restore gates on every node reporting ONE
    // schema version. Versions roll weekly; nodes divisible by 7 lag a
    // week behind — per snapshot: distinct-version count + agree flag.
    // Two-phase on purpose: a flat countDistinct formulation is ALL
    // duplicate-insensitive aggregates, so RemoveRedundantAggregates
    // elides the snapshots() distinct beneath it and the countDistinct
    // Expand runs over the full raw ledger (measured 0.9 → 11.6s at
    // sf0.1). Phase 1 (count per (day, version)) is duplicate-
    // sensitive, pinning the distinct; phase 2 folds the tiny
    // per-version rows. Nodes are unique within (day, sv), so
    // count(1) sums to the distinct node count.
    "b16_schema_versions" -> { (s, dir) =>
      snapshots(s, dir)
        .withColumn("sv", expr(schemaVerSpark))
        .groupBy("snapshot_day", "sv")
        .agg(count(lit(1)).as("n_nodes_v"))
        .groupBy("snapshot_day")
        .agg(
          count(lit(1)).as("n_versions"),
          min(col("sv")).as("min_version"),
          max(col("sv")).as("max_version"),
          sum(col("n_nodes_v")).as("n_nodes"))
        .withColumn("agreement", when(col("n_versions") === 1, 1).otherwise(0))
        .orderBy("snapshot_day")
    },

    // esop full topology resolution (topology/CassandraClusterTopology
    // .java:37-181, getNodesFromDcAndRack): cluster→DC→rack→endpoint
    // with per-level counts — one GROUPING SETS pass (a single scan +
    // Expand, not three scans) over the ledger.
    "b17_topology_full" -> { (s, dir) =>
      val base = ledger(s, dir)
        .withColumn("dc", concat(lit("dc"), (col("node_id") % 3).cast("string")))
        .withColumn("rack", expr("concat('r', CAST((node_id div 3) % 2 AS STRING))"))
        .withColumn("endpoint", expr(
          "concat('10.', CAST(node_id % 3 AS STRING), '.', CAST((node_id div 3) % 2 AS STRING), '.', CAST(node_id AS STRING))"))
      base.groupingSets(
          Seq(Seq(col("dc")), Seq(col("dc"), col("rack")),
            Seq(col("dc"), col("rack"), col("endpoint"))),
          col("dc"), col("rack"), col("endpoint"))
        .agg(
          countDistinct(col("node_id")).as("n_nodes"),
          count(lit(1)).as("n_entries"),
          asDouble(sum(col("size"))).as("total_size"))
        .select(col("dc"),
          coalesce(col("rack"), lit("ALL")).as("rack"),
          coalesce(col("endpoint"), lit("ALL")).as("endpoint"),
          col("n_nodes"), col("n_entries"), col("total_size"))
        .orderBy("dc", "rack", "endpoint")
    },

    // esop SSTable-generation semantics (`impl/SSTableUtils.java`:
    // sstable content hashing + detect-existing-by-generation): parse
    // node and generation out of the object_key FILENAME (not from
    // ledger columns — this is the path-parsing a real manifest needs),
    // then per-entity generation stats. A parse_ok counter cross-checks
    // the parsed node against the ledger's node_id.
    "b19_sstable_gen" -> { (s, dir) =>
      manifest(s, dir)
        .withColumn("gen",
          regexp_extract(col("object_key"), "sst_([0-9]+)$", 1).cast("long"))
        .withColumn("node_parsed",
          regexp_extract(col("object_key"), "^node([0-9]+)/", 1).cast("long"))
        .groupBy("keyspace", "table_name")
        .agg(
          max(col("gen")).as("max_gen"),
          countDistinct(col("gen")).as("n_generations"),
          count(lit(1)).as("n_sstables"),
          countDistinct(col("node_parsed")).as("n_nodes"),
          count(when(col("node_parsed") === col("node_id"), lit(1))).as("n_parse_ok"))
        .orderBy("keyspace", "table_name")
    },

    // esop bandwidth throttling (measure/DataRate.java,
    // impl/backup/Backuper.java --bandwidth): plan one snapshot's
    // uploads against a fixed rate budget — per-file transfer seconds
    // (ceil(size/rate)) and each node's running finish offset (nodes
    // upload their own files sequentially, in deterministic key order).
    // One bounded per-node window over one manifest pass.
    "b21_bandwidth_plan" -> { (s, dir) =>
      val rate = 25.0
      val w = Window.partitionBy("node_id").orderBy("object_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      manifest(s, dir)
        .filter(col("snapshot_day") === lit("2024-01-10").cast("date"))
        .withColumn("est_sec", ceil(asDouble(col("size")) / rate).cast("long"))
        .withColumn("finish_offset_sec", sum(col("est_sec")).over(w))
        .select(col("node_id"), col("object_key"),
          asDouble(col("size")).as("size"), col("est_sec"), col("finish_offset_sec"))
        .orderBy("node_id", "object_key")
    },

    // END-TO-END restore planning — the proof the §2.B catalog
    // COMPOSES (the b-series twin of d43's fused curation pipeline):
    // one plan answers the operator's actual question "restore the
    // cluster to T" by chaining the catalog's stages — (1) per-node
    // snapshot RESOLUTION, b12's as-of decision against the cut; (2)
    // the three READINESS gates on the resolved snapshot, b20's
    // composition (hash integrity over the resolved slice, token-ring
    // equality, cluster schema agreement — the last correctly judged
    // CLUSTER-wide per day, not per node); (3) the transfer SCHEDULE,
    // b33's round-robin LPT dealing over the resolved slice, rolled
    // up to the node's makespan (null when the node isn't ready — a
    // schedule for a node that fails its gates is a lie). One manifest
    // derivation feeds resolution, slice and dealing; tokens+schema
    // come from ONE bounded snapshots pass; every join after the
    // slice is against node- or day-sized aggregates (broadcast).
    "b34_restore_plan" -> { (s, dir) => restorePlan(s, dir) },

    // Parallel-stream restore scheduling — esop restores with a
    // per-node download executor pool; this plans WHICH of the W=4
    // concurrent streams each file of the node's latest manifest
    // rides: files ranked size-descending (the LPT intuition — big
    // transfers first so no stream gets a large file last) and dealt
    // round-robin, the deterministic window-expressible approximation
    // of min-makespan scheduling (true least-loaded-next is
    // order-dependent state, not SQL). Per (node, stream): file
    // count, bytes, transfer seconds at b21's rate budget, plus the
    // node's makespan and a balance factor (makespan / mean stream
    // time — the measure-don't-guess gate on the dealing). Ranking
    // windows partition per node; the makespan/balance windows run
    // over the bounded (node × 4) aggregate.
    "b33_restore_workers" -> { (s, dir) =>
      val W = 4
      val m = manifest(s, dir)
      val latest = m.groupBy("node_id").agg(max("snapshot_day").as("snapshot_day"))
      val wRank = Window.partitionBy("node_id")
        .orderBy(col("size").desc, col("object_key"))
      val wNode = Window.partitionBy("node_id")
      m.join(broadcast(latest), Seq("node_id", "snapshot_day"))
        .withColumn("worker", ((row_number().over(wRank) - 1) % W).cast("int"))
        .groupBy("node_id", "worker")
        .agg(count(lit(1)).as("n_files"), sum(col("size")).as("bytes_dec"))
        .withColumn("est_sec", ceil(asDouble(col("bytes_dec")) / 25.0).cast("long"))
        .withColumn("node_makespan", max(col("est_sec")).over(wNode))
        .withColumn("balance",
          col("node_makespan").cast("double") * count(lit(1)).over(wNode)
            / sum(col("est_sec")).over(wNode))
        .select(col("node_id"), col("worker"), col("n_files"),
          asDouble(col("bytes_dec")).as("bytes"), col("est_sec"),
          col("node_makespan"), col("balance"))
        .orderBy("node_id", "worker")
    },

    // Small-object compaction planning — the batching dual of b09's
    // multipart SPLIT: where b09 cuts big files into chunk-sized
    // parts, this bins a snapshot's many SMALL objects into
    // ~target-size transfer groups (Cassandra emits thousands of
    // KB-scale SSTable components per table; fetching them one
    // request at a time is the small-files problem — esop batches
    // work per entity the same way a Spark OPTIMIZE job bin-packs
    // files). Greedy sequential fill in deterministic key order:
    // bin = (running size BEFORE this file) div target, so a file
    // that crosses the boundary closes its bin — every bin reaches
    // ≥target except the last per group, and assignment is a pure
    // window + integer division (exact cents, no float). The window
    // partitions by (node, keyspace, table) — exactly how a real
    // compaction scopes, so groups parallelize across the fleet and
    // no global sort exists at any scale.
    "b32_compaction_plan" -> { (s, dir) =>
      val targetCents = 50000L // one transfer group ≈ 500.00 size units
      val w = Window.partitionBy("node_id", "keyspace", "table_name")
        .orderBy("object_key")
        .rowsBetween(Window.unboundedPreceding, -1)
      manifest(s, dir)
        .filter(col("snapshot_day") === lit("2024-01-10").cast("date"))
        .withColumn("size_cents", (col("size") * 100).cast("long"))
        .withColumn("cum_before",
          coalesce(sum(col("size_cents")).over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_before div ${targetCents}L"))
        .groupBy("node_id", "keyspace", "table_name", "bin")
        .agg(count(lit(1)).as("n_files"),
          sum(col("size_cents")).as("bin_cents"),
          min(col("object_key")).as("first_key"),
          max(col("object_key")).as("last_key"))
        .orderBy("node_id", "keyspace", "table_name", "bin")
    },

    // The esop go/no-go question a restore starts with — composition of
    // the three gates esop checks before touching data: manifest hash
    // integrity (HashServiceImpl), token-ring equality
    // (Manifest.hasSameTokens) and cluster schema agreement
    // (ClusterSchemaVersions). One row per snapshot with the violation
    // counts and a ready flag; three single-pass aggs joined on the
    // tiny snapshot_day key.
    "b20_restore_readiness" -> { (s, dir) =>
      val hash = manifest(s, dir).groupBy("snapshot_day")
        .agg(count(when(col("upload_hash") =!= col("download_hash"), lit(1)))
          .as("n_hash_mismatch"))
      // token + schema checks share ONE pass over snapshots — separate
      // aggs would recompute the manifest dedupe window per branch
      val snap = snapshots(s, dir)
        .withColumn("toks", expr(tokenArraySpark))
        .withColumn("bh", expr(sortedListHash("toks")))
        .withColumn("th", expr(sortedListHash(targetTokensSpark)))
        .withColumn("sv", expr(schemaVerSpark))
        .groupBy("snapshot_day")
        .agg(
          count(when(col("bh") =!= col("th"), lit(1))).as("n_token_mismatch"),
          countDistinct(col("sv")).as("n_versions"))
      hash.join(snap, Seq("snapshot_day"))
        .withColumn("ready",
          when(col("n_hash_mismatch") === 0 && col("n_token_mismatch") === 0
            && col("n_versions") === 1, 1).otherwise(0))
        .orderBy("snapshot_day")
    },

    // esop's on-disk truth is a jackson-serialized manifest JSON per
    // backup (Manifest.java:47-54: snapshot + tokens + schemaVersion;
    // entry fields ManifestEntry.java:36-52: objectKey/size/type/hash).
    // This operator proves the §2.B suite runs on that DOCUMENT shape:
    // one nested JSON doc per (node, snapshot) is written through the
    // IO layer, read back with an explicit schema (no inference — at
    // 100 TB schema inference re-scans the corpus), entries exploded
    // back into ledger columns, and the b01-style report re-derived
    // from the ingested documents. The oracle computes the identical
    // report straight from the ledger — the JSON round-trip must be
    // lossless.
    "b22_manifest_ingest" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val docs = manifest(s, dir)
        .groupBy("node_id", "snapshot_day")
        // sort_array: collect_list order is nondeterministic across
        // runs/JVMs; the report is order-insensitive but the on-disk
        // JSON fixture should be byte-reproducible (struct ordering is
        // well-defined, objectKey leads and is unique per group).
        .agg(sort_array(collect_list(struct(
          col("object_key").as("objectKey"),
          col("size"),
          col("ftype").as("type"),
          col("upload_hash").as("hash"),
          concat_ws(".", col("keyspace"), col("table_name")).as("keyspaceTable"))))
          .as("entries"))
        .withColumn("tokens",
          expr(s"transform(array_sort($tokenArraySpark), x -> CAST(x AS STRING))"))
        .withColumn("schemaVersion", expr(schemaVerSpark))
        .withColumn("snapshot", concat(lit("snapshot-"),
          date_format(col("snapshot_day"), "yyyyMMdd"), lit("-node"),
          col("node_id").cast("string")))
      val path = graft.sources.Scratch.materialize(
        s, "graft_manifest_json", dir,
        (df, p) => graft.sources.IO.writeJson(df, p))(docs)
      val entry = StructType(Seq(
        StructField("objectKey", StringType),
        StructField("size", DecimalType(18, 2)),
        StructField("type", StringType),
        StructField("hash", StringType),
        StructField("keyspaceTable", StringType)))
      val schema = StructType(Seq(
        StructField("node_id", LongType),
        StructField("snapshot_day", DateType),
        StructField("snapshot", StringType),
        StructField("schemaVersion", StringType),
        StructField("tokens", ArrayType(StringType)),
        StructField("entries", ArrayType(entry))))
      s.read.schema(schema).json(path)
        .select(col("snapshot_day"), col("snapshot"), col("schemaVersion"),
          size(col("tokens")).cast("long").as("n_tokens"),
          explode(col("entries")).as("e"))
        .groupBy("snapshot_day")
        .agg(
          countDistinct(col("snapshot")).as("n_manifests"),
          count(lit(1)).as("n_files"),
          asDouble(sum(col("e.size"))).as("total_size"),
          countDistinct(col("e.keyspaceTable")).as("n_tables"),
          countDistinct(col("schemaVersion")).as("n_versions"),
          min(col("n_tokens")).as("min_tokens"))
        .orderBy("snapshot_day")
    },

    // Commit-log INTERVAL replay: esop's PIT window has a start and an
    // end (impl/restore/CommitLogRestorationStrategy) — b07 gives the
    // final state at one cut; this classifies every (node, key) between
    // two cuts as added / changed / removed. COMMIT_LOG-typed events
    // act as tombstones (a key whose last event is a tombstone is
    // absent from that cut's state). ONE pass over the ledger:
    // conditional max(struct) aggregates carry both cuts' last writes
    // through a single shuffle — no self-join of two PIT states.
    "b23_pit_diff" -> { (s, dir) =>
      val t1 = lit("2024-01-08 12:00:00").cast("timestamp")
      val t2 = lit("2024-01-15 12:00:00").cast("timestamp")
      ledger(s, dir)
        .filter(col("ts") <= t2)
        // coalesce: NULL props must hash to ONE key in both engines —
        // the oracle pairs the two cuts with an equi-join, which would
        // drop NULL keys while this groupBy keeps them as a group
        .withColumn("k", coalesce(regexp_extract(col("props"), "([0-9]+)", 1), lit("")))
        .groupBy("node_id", "k")
        .agg(
          max(when(col("ts") <= t1,
            struct(col("ts"), col("event_id"), col("size"), col("ftype")))).as("s1"),
          max(struct(col("ts"), col("event_id"), col("size"), col("ftype"))).as("s2"))
        .withColumn("p1", col("s1").isNotNull && col("s1.ftype") =!= "COMMIT_LOG")
        .withColumn("p2", col("s2.ftype") =!= "COMMIT_LOG")
        .withColumn("status",
          when(!col("p1") && col("p2"), "added")
            .when(col("p1") && !col("p2"), "removed")
            .when(col("p1") && col("p2") && col("s1.event_id") =!= col("s2.event_id"), "changed")
            .otherwise("unchanged"))
        .filter(col("status").isin("added", "removed", "changed"))
        .select(col("node_id"), col("k"), col("status"),
          when(col("p1"), col("s1.event_id")).as("old_event_id"),
          when(col("p2"), col("s2.event_id")).as("new_event_id"),
          when(col("p1"), asDouble(col("s1.size"))).as("old_size"),
          when(col("p2"), asDouble(col("s2.size"))).as("new_size"))
        .orderBy("node_id", "k")
    },

    // esop StorageLocation algebra (impl/StorageLocation.java parses
    // proto://bucket/cluster/dc/node): a fleet spanning multiple
    // buckets/protocols. The fleet's location strings are built
    // deterministically, then PARSED BACK (the operator under test is
    // the parse), cross-checked against the ledger's node_id, and the
    // inventory rolled up per (proto, bucket) — the per-location view
    // a multi-bucket deployment plans transfers with.
    "b24_storage_locations" -> { (s, dir) =>
      ledger(s, dir)
        .withColumn("location", expr(
          """concat(CASE CAST(node_id % 4 AS INT) WHEN 0 THEN 's3' WHEN 1 THEN 'gcp' WHEN 2 THEN 'azure' ELSE 'file' END,
            |'://bkt', CAST(node_id % 2 AS STRING),
            |'/cluster1/dc', CAST(node_id % 3 AS STRING),
            |'/node', CAST(node_id AS STRING))""".stripMargin))
        .withColumn("proto", regexp_extract(col("location"), "^([a-z0-9]+)://", 1))
        .withColumn("bucket", regexp_extract(col("location"), "^[a-z0-9]+://([^/]+)/", 1))
        .withColumn("dc_parsed", regexp_extract(col("location"), "/(dc[0-9]+)/", 1))
        .withColumn("node_parsed",
          regexp_extract(col("location"), "/node([0-9]+)$", 1).cast("long"))
        .groupBy("proto", "bucket")
        .agg(
          countDistinct(col("node_parsed")).as("n_nodes"),
          countDistinct(col("dc_parsed")).as("n_dcs"),
          count(lit(1)).as("n_files"),
          asDouble(sum(col("size"))).as("total_size"),
          count(when(col("node_parsed") === col("node_id"), lit(1))).as("n_parse_ok"))
        .orderBy("proto", "bucket")
    },

    // esop `RestorationStrategy` snapshot resolution: each restore request
    // (commit-log event) matched to the latest snapshot strictly before
    // its day — an AS-OF join. Spark-first: union snapshots (visible from
    // day+1) with requests, one per-node ordered window carries the last
    // visible snapshot forward — a single shuffle on node_id, no
    // correlated per-row probing, scales linearly.
    "b12_asof_join" -> { (s, dir) =>
      val snaps = snapshots(s, dir).select(
        col("node_id"),
        date_add(col("snapshot_day"), 1).cast("timestamp").as("ord_ts"),
        lit(0).as("kind"),
        col("snapshot_day").as("snap_day"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("date").as("request_day"))
      val reqs = ledger(s, dir).filter(col("ftype") === "COMMIT_LOG").select(
        col("node_id"),
        col("ts").as("ord_ts"),
        lit(1).as("kind"),
        lit(null).cast("date").as("snap_day"),
        col("event_id"),
        col("snapshot_day").as("request_day"))
      val w = Window.partitionBy("node_id")
        .orderBy("ord_ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      snaps.unionAll(reqs)
        .withColumn("matched_day", last(col("snap_day"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select("event_id", "node_id", "request_day", "matched_day")
        .orderBy("event_id")
    },

    // Restore fetch plan: esop's incremental upload stores each file
    // ONCE — under the snapshot that first saw it — and later manifests
    // just reference it (`impl/backup/Backuper.java` ALREADY_PRESENT).
    // Restoring the latest snapshot therefore fetches from MANY earlier
    // backups; this groups the latest manifest per node by the source
    // snapshot each file actually lives under (provenance = min
    // snapshot_day per (node, object_key)). Both aggregates key on the
    // manifest's natural keys; `latest` is per-node (broadcast-sized at
    // any fleet size).
    "b25_fetch_plan" -> { (s, dir) =>
      val m = manifest(s, dir)
      val latest = m.groupBy("node_id").agg(max("snapshot_day").as("snapshot_day"))
      val target = m.join(broadcast(latest), Seq("node_id", "snapshot_day"))
      val firstSeen = m.groupBy("node_id", "object_key")
        .agg(min("snapshot_day").as("src_day"))
      target.join(firstSeen, Seq("node_id", "object_key"))
        .groupBy("node_id", "src_day")
        .agg(count(lit(1)).as("n_files"),
          asDouble(sum(col("size"))).as("bytes"))
        .orderBy("node_id", "src_day")
    },

    // esop's upload tracker (`impl/AbstractTracker.java:43` — units with
    // NOT_STARTED/FINISHED/FAILED/IGNORED states, sessions reporting
    // finished/submitted progress, `:152-158`): the mid-backup progress
    // report at a time cut. Unit states derive deterministically from
    // the ledger (failures/ignores pinned by event_id; FINISHED = upload
    // event at or before the cut) — one conditional-agg pass per
    // (node, snapshot) session, no per-unit state kept anywhere.
    "b26_progress" -> { (s, dir) =>
      val cut = lit("2024-01-15 12:00:00").cast("timestamp")
      ledger(s, dir)
        .withColumn("state",
          when(col("event_id") % 41 === 0, "FAILED")
            .when(col("event_id") % 37 === 0, "IGNORED")
            .when(col("ts") <= cut, "FINISHED")
            .otherwise("NOT_STARTED"))
        .groupBy("node_id", "snapshot_day")
        .agg(count(lit(1)).as("n_units"),
          count(when(col("state") === "FINISHED", 1)).as("n_finished"),
          count(when(col("state") === "FAILED", 1)).as("n_failed"),
          count(when(col("state") === "IGNORED", 1)).as("n_ignored"))
        .withColumn("progress",
          col("n_finished").cast("double") / col("n_units"))
        .withColumn("complete",
          col("n_failed") === 0
            && col("n_finished") + col("n_ignored") === col("n_units"))
        .orderBy("node_id", "snapshot_day")
    },

    // esop's ManifestEnricher (`ManifestEnricher.java:59-102`): before a
    // restore, every manifest entry must resolve to a LOCAL file path —
    // and the local table id can differ from the manifest's when the
    // table was dropped and recreated since the backup (the exact
    // hard-link hazard the enricher exists for). Secondary-index files
    // resolve one directory deeper (`SSTableUtils.isSecondaryIndexManifest`,
    // the subPathEndIndex 3 vs 4 branch). Here the id remap is a pure
    // per-row derivation (recreated tables marked by a deterministic
    // hash so the oracle mirrors it; in production this joins the
    // ≤|tables|-row local-schema dim — broadcast either way), applied to
    // each node's LATEST manifest (b25's broadcast latest-day idiom):
    // zero shuffles beyond that broadcast join at any manifest size.
    "b27_local_resolve" -> { (s, dir) =>
      val m = manifest(s, dir)
      val latest = m.groupBy("node_id").agg(max("snapshot_day").as("snapshot_day"))
      m.join(broadcast(latest), Seq("node_id", "snapshot_day"))
        .withColumn("k", regexp_extract(col("object_key"), "sst_([0-9]+)$", 1).cast("long"))
        .withColumn("filename", regexp_extract(col("object_key"), "([^/]+)$", 1))
        .withColumn("is_index", col("k") % 11 === 0)
        .withColumn("recreated",
          hash32(concat(col("keyspace"), lit("."), col("table_name"))) % 3 === 0)
        .withColumn("manifest_tid",
          substring(md5(concat(col("keyspace"), lit("."), col("table_name"), lit("#gen0"))), 1, 8))
        .withColumn("local_tid",
          when(col("recreated"),
            substring(md5(concat(col("keyspace"), lit("."), col("table_name"), lit("#gen1"))), 1, 8))
            .otherwise(col("manifest_tid")))
        .withColumn("local_file", concat(
          col("keyspace"), lit("/"), col("table_name"), lit("-"), col("local_tid"), lit("/"),
          when(col("is_index"),
            concat(lit(".idx"), (col("k") % 2).cast("string"), lit("/"))).otherwise(""),
          col("filename")))
        .select(col("node_id"), col("object_key"), col("keyspace"), col("table_name"),
          col("manifest_tid"), col("local_tid"),
          col("recreated").as("id_changed"), col("is_index"), col("local_file"))
        .orderBy("node_id", "object_key")
    },

    // esop's commit-log restore download plan
    // (`RestoreCommitLogsOperation.java:109-148`): segment object keys
    // embed the close mtime (`BackupCommitLogsOperation.java:84`
    // appends lastModified to the bucket key), the PIT window selects
    // segments with mtime ∈ [start, end], PLUS the first segment past
    // the end — the "overhanging" segment (`:130-145`) whose tail may
    // hold mutations stamped before the cut. Selection is one scan
    // filter plus a per-node min(struct) aggregate (map-side partials
    // over bounded node keys) joined back broadcast — never a sort.
    "b28_commitlog_fetch" -> { (s, dir) =>
      val lo = expr("unix_micros(TIMESTAMP '2024-01-10 00:00:00')")
      val hi = expr("unix_micros(TIMESTAMP '2024-01-20 00:00:00')")
      val segs = ledger(s, dir).filter(col("ftype") === "COMMIT_LOG")
        .select(col("node_id"), col("event_id"),
          unix_micros(col("ts")).as("mtime"))
        .withColumn("seg_key", concat(
          lit("commitlog/CommitLog-7-"), col("event_id").cast("string"),
          lit(".log."), col("mtime").cast("string")))
      val windowed = segs.filter(col("mtime") >= lo && col("mtime") <= hi)
        .withColumn("reason", lit("window"))
      val firstOver = segs.filter(col("mtime") > hi)
        .groupBy("node_id")
        .agg(min(struct(col("mtime"), col("event_id"))).as("m"))
        .select(col("node_id"), col("m.event_id").as("event_id"))
      val over = segs.join(broadcast(firstOver), Seq("node_id", "event_id"))
        .withColumn("reason", lit("overhang"))
      windowed.unionByName(over)
        .select("node_id", "seg_key", "mtime", "reason")
        .orderBy("node_id", "mtime", "seg_key")
    },

    // Capacity planning: per-node backup growth as a least-squares
    // trend over the daily upload volume — when does this fleet's
    // bucket budget run out (the question every retention policy and
    // `--bandwidth` setting answers to). Determinism discipline: bytes
    // become integer CENTS and day offsets integers, and the five
    // regression sums run in EXACT 128-bit integer arithmetic —
    // decimal(38,0) here (map-side partial combine), native HUGEINT in
    // the oracle — because long sums genuinely overflow at fleet
    // scale (1 TB/day × 2 years puts Σx·cents past 2⁶³); slope and
    // mean perform the only float ops, identical one-shot IEEE
    // divides of identical integers in both engines. Two bounded-key
    // aggregates ((node, day) then node), linear at any ledger size.
    "b29_growth_trend" -> { (s, dir) =>
      val d38 = "decimal(38,0)"
      val daily = ledger(s, dir)
        .groupBy("node_id", "snapshot_day")
        .agg(sum((col("size") * 100).cast("long")).as("cents"))
        .withColumn("x", datediff(col("snapshot_day"), lit("2024-01-01").cast("date")).cast("long"))
      daily.groupBy("node_id")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x").cast(d38)).as("sx"),
          sum(col("cents").cast(d38)).as("sy"),
          sum((col("x") * col("x")).cast(d38)).as("sxx"),
          sum(col("x").cast(d38) * col("cents").cast(d38)).as("sxy"))
        .select(col("node_id"), col("n_days"),
          (col("sy").cast("double") / 100 / col("n_days")).as("mean_daily_bytes"),
          ((col("n_days").cast(d38) * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n_days").cast(d38) * col("sxx") - col("sx") * col("sx")).cast("double")
            / 100).as("slope_bytes_per_day"))
        .orderBy("node_id")
    },

    // esop restore-into-a-DIFFERENT-cluster topology remap
    // (topology/CassandraClusterTopology.java:191-199
    // `translateToNodeTopology` resolves which target node a source
    // node's snapshot lands on; impl/restore/coordination/
    // BaseRestoreOperationCoordinator.java drives the per-node restore;
    // InPlaceRestorationStrategy.java:82-88 resolves the node from the
    // uploaded topology and :143-150 carries the source tokens onto the
    // target): every SOURCE node of the backed-up cluster (b15's 8-vnode
    // md5 token lists) is assigned to the TARGET-cluster node that owns
    // the PLURALITY of its token ring. Ownership is Cassandra's ring
    // rule — token t belongs to the target with the smallest ring token
    // ≥ t, wrapping past the ring's end to the globally smallest target
    // token. The target ring (7 nodes — deliberately a different shape
    // than the source fleet) stands in for the externally-supplied
    // destination cluster, exactly as d42's benchmark stands in for an
    // external eval suite.
    // Spark-first: union the target ring with the source vnodes and let
    // ONE descending-token running-`last` window stamp the owning
    // target onto every source vnode — b12's as-of machinery with the
    // order flipped for successor semantics — then a plurality argmax
    // per source node via max(struct). The whole stream is
    // TOPOLOGY-sized ((n_src + n_tgt) × 8 rows — thousands of rows for
    // a thousands-node fleet), so the global (unpartitioned) window is
    // bounded by construction: data volume never enters this query, it
    // scales with cluster size only.
    "b30_topology_remap" -> { (s, dir) =>
      val src = snapshots(s, dir).select("node_id").distinct()
        .withColumn("toks", expr(tokenArraySpark))
        .select(col("node_id"), explode(col("toks")).as("token"))
      val tgt = s.range(7).select(col("id").as("t_node"))
        .withColumn("t_token", explode(expr(
          "transform(sequence(0, 7), i -> CAST(conv(substr(md5(concat('ttok', CAST(t_node AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS LONG))")))
      val stream = tgt.select(col("t_token").as("token"), lit(1).as("is_tgt"),
          col("t_node"), lit(null).cast("long").as("src_node"))
        .unionAll(src.select(col("token"), lit(0).as("is_tgt"),
          lit(null).cast("long").as("t_node"), col("node_id").as("src_node")))
      val w = Window.orderBy(col("token").desc, col("is_tgt").desc, col("t_node").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wrap = tgt.orderBy(col("t_token").asc, col("t_node").asc).limit(1)
        .select(col("t_node").as("wrap_node"))
      stream
        .withColumn("owner", last(col("t_node"), ignoreNulls = true).over(w))
        .filter(col("is_tgt") === 0)
        .crossJoin(broadcast(wrap))
        .withColumn("owner", coalesce(col("owner"), col("wrap_node")))
        .groupBy(col("src_node"), col("owner"))
        .agg(count(lit(1)).as("n_owned"))
        .groupBy("src_node")
        .agg(max(struct(col("n_owned"), (-col("owner")).as("neg"))).as("m"),
          sum(col("n_owned")).as("n_vnodes"))
        .select(col("src_node").as("node_id"),
          (-col("m.neg")).as("target_node"),
          col("m.n_owned").as("n_owned_vnodes"),
          col("n_vnodes"))
        .orderBy("node_id")
    },

    // esop restore-over-an-existing-node data synchronization plan
    // (impl/restore/strategy/DataSynchronizator.java:40-93 — round 1:
    // manifest entries absent locally are downloaded, CQL_SCHEMA
    // skipped; round 2: local files not in the manifest, or whose
    // hash disagrees, are deleted — a hash-mismatched file is deleted
    // but NOT re-downloaded, esop's exact quirk, mirrored here;
    // impl/Snapshots.java:47-200 / impl/CassandraData.java:52-77 feed
    // the local listing): the per-node reconciliation of the LATEST
    // manifest against the node's current disk state. The disk state
    // is an EXTERNAL input (CassandraData lists real data dirs) — here
    // the disk state a node ACCUMULATES: the last-seen version of every
    // file from all snapshots before the latest (the ledger's
    // corrupt-download model supplies the hash mismatches) plus
    // deterministic orphans, materialized through the Scratch
    // external-fixture layer like b18's remote inventory. One
    // full-outer equi-join on (node, object_key) classifies every file
    // into download / keep / delete_mismatch / delete_untracked; at
    // 100 TB it shuffles only the join keys + hashes, and the
    // per-(node, action) rollup is a bounded-key aggregate.
    "b31_sync_plan" -> { (s, dir) =>
      val m = manifest(s, dir).filter(col("ftype") =!= "CQL_SCHEMA")
      val latestDay = m.groupBy("node_id").agg(max("snapshot_day").as("snapshot_day"))
      val target = m.join(broadcast(latestDay), Seq("node_id", "snapshot_day"))
        .select("node_id", "object_key", "upload_hash", "size")
      val w = Window.partitionBy("node_id", "object_key")
        .orderBy(col("snapshot_day").desc)
      val localState = m
        .join(broadcast(latestDay.toDF("node_id", "latest_day")), Seq("node_id"))
        .filter(col("snapshot_day") < col("latest_day"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      // 1-in-13 of the local files are LOCALLY MODIFIED (stale-hash
      // model keyed on the object, so the mismatch path is exercised
      // at every sf) — on top of the ledger's 1-in-53 corrupt
      // downloads; both fail DataSynchronizator's hash check
      // (SSTableUtils.isExistingSStable) and classify delete_mismatch
      val localHash = when(
        pmod(hash32(concat(lit("stale#"), col("object_key"))), lit(13L)) === 0,
        md5(concat(lit("stale#"), col("object_key"))))
        .otherwise(col("download_hash"))
      val localListing = localState
        .select(col("node_id"), col("object_key"), localHash.as("local_hash"))
        .unionAll(localState
          .filter(pmod(hash32(concat(lit("o#"), col("object_key"))), lit(7L)) === 0)
          .select(col("node_id"), concat(col("object_key"), lit(".orphan")).as("object_key"),
            col("download_hash").as("local_hash")))
      val localPath = graft.sources.Scratch.materialize(
        s, "graft_local_datafiles", dir)(localListing)
      val localFs = graft.sources.IO.readParquet(s, localPath)
      target.join(localFs, Seq("node_id", "object_key"), "full_outer")
        .withColumn("action",
          when(col("local_hash").isNull, "download")
            .when(col("upload_hash").isNull, "delete_untracked")
            .when(col("upload_hash") =!= col("local_hash"), "delete_mismatch")
            .otherwise("keep"))
        .groupBy("node_id", "action")
        .agg(count(lit(1)).as("n_files"),
          asDouble(sum(coalesce(col("size"), dec2(lit(0))))).as("bytes"))
        .orderBy("node_id", "action")
    },

    // RPO compliance — the freshness report a backup fleet is actually
    // monitored by: per (node, keyspace), when was the last FULLY
    // verified snapshot day (a day counts only if none of its manifest
    // entries fail the b08 hash check — esop gates restore on
    // verification, `impl/hash/HashServiceImpl.java`), how stale is it
    // against a per-keyspace RPO policy, and is that a violation.
    // Never-verified pairs stay in the output as violations with a
    // null last_ok_day (the worst state a report could hide).
    // Scale: two stacked aggs — the first shuffles once on the
    // bounded (node, ks, day) key with map-side partials doing the
    // real collapse; the second re-aggs the already-tiny daily rows.
    // No join anywhere: policy is a CASE over the keyspace.
    "b35_rpo_compliance" -> { (s, dir) =>
      val now = lit("2024-01-31").cast("date")
      manifest(s, dir)
        .groupBy("node_id", "keyspace", "snapshot_day")
        .agg(count(when(col("upload_hash") =!= col("download_hash"), 1))
          .as("n_bad"))
        .groupBy("node_id", "keyspace")
        .agg(
          max(when(col("n_bad") === 0, col("snapshot_day"))).as("last_ok_day"),
          sum(col("n_bad")).as("n_corrupt"),
          count(lit(1)).as("n_days"))
        .withColumn("lag_days", datediff(now, col("last_ok_day")).cast("long"))
        .withColumn("rpo_days",
          when(col("keyspace") === "ks0", 1L)
            .when(col("keyspace") === "ks1", 3L).otherwise(7L))
        .withColumn("status",
          when(col("last_ok_day").isNull || col("lag_days") > col("rpo_days"),
            "VIOLATION").otherwise("OK"))
        .orderBy("node_id", "keyspace")
    },

    // Verification sampling plan — the spot-check a fleet runs when
    // re-hashing everything is unaffordable (b08 verifies ALL entries;
    // at 100 TB the nightly full pass is exactly what you stop doing):
    // from the latest snapshot, 2 files per (node, keyspace, table)
    // picked by md5 rank — deterministic yet uniform-ish, so the
    // sample can't be gamed by key naming and re-runs audit the SAME
    // files. The window partitions by the bounded entity key; the
    // latest-day resolution is a tiny agg broadcast back (the b13
    // two-role shape, pin events=2).
    "b36_verify_sample" -> { (s, dir) =>
      val m = manifest(s, dir)
      val latest = m.agg(max(col("snapshot_day")).as("snapshot_day"))
      val w = Window.partitionBy("node_id", "keyspace", "table_name")
        .orderBy(md5(concat(lit("vs"), col("object_key"))), col("object_key"))
      m.join(broadcast(latest), Seq("snapshot_day"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("node_id"), col("keyspace"), col("table_name"),
          col("object_key"), col("rk"), asDouble(col("size")).as("size"),
          (col("upload_hash") === col("download_hash")).as("hash_ok"))
        .orderBy("node_id", "keyspace", "table_name", "rk")
    },

    // Retention-aware GC plan — what `RemoveBackupOperation` must
    // compute before deleting a backup: a remote object is physically
    // deletable only when NO surviving snapshot still references it
    // (esop's shared-file rule — removable entries are the ones
    // referenced exclusively by the backups being removed,
    // Manifest.java:473-483). With an olderThan cutoff
    // (RemoveBackupOperation.java:184-186) that collapses to a pure
    // per-object aggregate: deletable ⟺ max(referencing snapshot_day)
    // < cutoff — NO join against the survivor set at all, one
    // object-keyed exchange (b05's shape) then a bounded per-entity
    // rollup. Reclaimed bytes use the FIRST-appearance copy's size
    // (incremental storage keeps one physical object under its first
    // snapshot — b25's provenance rule), i.e. min_by(size, day).
    "b37_orphan_gc" -> { (s, dir) =>
      val cutoff = lit("2024-01-08").cast("date")
      manifest(s, dir)
        .groupBy("object_key", "keyspace", "table_name")
        .agg(
          min_by(col("size"), col("snapshot_day")).as("first_size"),
          max(col("snapshot_day")).as("last_day"))
        .groupBy("keyspace", "table_name")
        .agg(
          count(lit(1)).as("n_objects"),
          count(when(col("last_day") < cutoff, lit(1))).as("n_deletable"),
          asDouble(coalesce(sum(when(col("last_day") < cutoff, col("first_size"))),
            lit(0).cast("decimal(18,2)"))).as("bytes_reclaimed"))
        .orderBy("keyspace", "table_name")
    },

    // Backup-continuity streaks — the cadence report behind "has this
    // node backed up EVERY day?": consecutive-snapshot-day runs per
    // node via the gaps-and-islands anchor trick (day − row_number is
    // CONSTANT within a consecutive run, so the island id falls out of
    // one window + one agg — no self-join, no iteration). Rides the
    // bounded (node, day) snapshots frame (the 2-column map-side
    // distinct, never the manifest), one exchange on node_id; at 100 TB
    // the window partitions are per-node day counts — topology-sized,
    // not data-sized. The b35 RPO report says how STALE a node is now;
    // this says how RELIABLE its cadence has been. Pin events=1.
    "b38_backup_streaks" -> { (s, dir) =>
      val w = Window.partitionBy("node_id").orderBy("snapshot_day")
      snapshots(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("anchor", expr("date_sub(snapshot_day, rn)"))
        .groupBy("node_id", "anchor")
        .agg(
          min(col("snapshot_day")).as("streak_start"),
          max(col("snapshot_day")).as("streak_end"),
          count(lit(1)).as("streak_len"))
        .select("node_id", "streak_start", "streak_end", "streak_len")
        .orderBy("node_id", "streak_start")
    },

    // Manifest EXPORT — the write-side dual of b22's ingest, closing
    // the esop manifest lifecycle (Manifest.java:47-54 serializes one
    // JSON document per backup): each (node, snapshot) renders its
    // entries into the canonical manifest JSON — entries sorted, all
    // string building deterministic concat (no engine JSON serializer:
    // key order and whitespace would differ cross-engine; a canonical
    // byte form is also what makes manifest md5s COMPARABLE, the b15
    // sorted-list-hash argument applied to whole documents). One
    // manifest-keyed agg (pin events=1); collect_list is bounded by
    // the per-backup file count — exactly what esop holds in memory to
    // write the same file. Output carries the doc's length + md5, the
    // upload-integrity record a registry keeps per manifest.
    "b39_manifest_export" -> { (s, dir) =>
      val entry = concat(lit("{\"key\":\""), col("object_key"),
        lit("\",\"size\":"), col("size").cast("string"),
        lit(",\"hash\":\""), col("upload_hash"), lit("\"}"))
      manifest(s, dir)
        .withColumn("e", entry)
        .groupBy("node_id", "snapshot_day")
        .agg(count(lit(1)).as("n_entries"),
          concat_ws(",", array_sort(collect_list(col("e")))).as("ej"))
        .withColumn("doc", concat(
          lit("{\"snapshot\":\"snap-"), col("snapshot_day").cast("string"),
          lit("\",\"node\":"), col("node_id").cast("string"),
          lit(",\"schemaVersion\":\""), expr(schemaVerSpark),
          lit("\",\"entries\":["), col("ej"), lit("]}")))
        .select(col("node_id"), col("snapshot_day"), col("n_entries"),
          length(col("doc")).cast("long").as("manifest_len"),
          md5(col("doc")).as("manifest_md5"))
        .orderBy("node_id", "snapshot_day")
    }
  )

  val oracle: Map[String, String] = Map(
    "b01_manifest_list" -> (cte +
      """SELECT snapshot_day, COUNT(1) AS n_files,
        |  CAST(SUM(size) AS DOUBLE) AS total_size,
        |  COUNT(DISTINCT node_id) AS n_nodes,
        |  COUNT(DISTINCT concat(keyspace, '.', table_name)) AS n_tables
        |FROM manifest GROUP BY snapshot_day
        |ORDER BY snapshot_day DESC""".stripMargin),

    "b02_list_lastn" -> (cte +
      """SELECT node_id, snapshot_day, rn FROM (
        |  SELECT node_id, snapshot_day,
        |    ROW_NUMBER() OVER (PARTITION BY node_id ORDER BY snapshot_day DESC) AS rn
        |  FROM snapshots) t
        |WHERE rn <= 3 ORDER BY node_id, rn""".stripMargin),

    "b03_list_from_ts" -> (cte +
      """SELECT snapshot_day, COUNT(1) AS n_files,
        |  CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM manifest WHERE snapshot_day <= DATE '2024-01-20'
        |GROUP BY snapshot_day ORDER BY snapshot_day DESC""".stripMargin),

    "b04_snapshot_diff" -> (cte +
      """SELECT object_key, keyspace, table_name, node_id, CAST(size AS DOUBLE) AS size
        |FROM manifest m
        |WHERE snapshot_day = DATE '2024-01-10'
        |  AND NOT EXISTS (SELECT 1 FROM manifest p
        |    WHERE p.snapshot_day < DATE '2024-01-10' AND p.object_key = m.object_key)
        |ORDER BY object_key""".stripMargin),

    "b05_reclaimable" -> (cte +
      """, refs AS (SELECT object_key, COUNT(1) AS n_refs FROM manifest GROUP BY object_key)
        |SELECT m.snapshot_day,
        |  CAST(COALESCE(SUM(CASE WHEN r.n_refs = 1 THEN m.size END), 0) AS DOUBLE) AS reclaimable,
        |  COUNT(CASE WHEN r.n_refs = 1 THEN 1 END) AS n_removable
        |FROM manifest m JOIN refs r ON m.object_key = r.object_key
        |GROUP BY m.snapshot_day ORDER BY m.snapshot_day""".stripMargin),

    "b06_retention" -> (cte +
      """SELECT snapshot_day, COUNT(1) AS n_files,
        |  CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM manifest WHERE snapshot_day < DATE '2024-01-08'
        |GROUP BY snapshot_day ORDER BY snapshot_day""".stripMargin),

    "b40_replica_spread" -> (cte +
      """SELECT keyspace, table_name,
        |  CAST(regexp_extract(object_key, 'sst_([0-9]+)$', 1) AS BIGINT) AS sst,
        |  count(DISTINCT node_id) AS n_replicas,
        |  CAST(sum(size) AS DOUBLE) AS total_size,
        |  count(DISTINCT node_id) < 2 AS under_replicated
        |FROM manifest
        |WHERE snapshot_day = (SELECT max(snapshot_day) FROM manifest)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    "b43_snapshot_completeness" -> (cte +
      """SELECT node_id, snapshot_day, count(1) AS n_files,
        |  count(CASE WHEN ftype = 'MANIFEST_FILE' THEN 1 END) AS n_manifest,
        |  count(CASE WHEN ftype = 'CQL_SCHEMA' THEN 1 END) AS n_schema,
        |  count(CASE WHEN ftype = 'COMMIT_LOG' THEN 1 END) AS n_commitlog,
        |  count(CASE WHEN ftype = 'MANIFEST_FILE' THEN 1 END) > 0
        |    AND count(CASE WHEN ftype = 'CQL_SCHEMA' THEN 1 END) > 0 AS complete
        |FROM manifest GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "b45_backup_cadence" -> (cte +
      """, pn AS (
        |  SELECT node_id, min(snapshot_day) AS first_day,
        |         max(snapshot_day) AS last_day,
        |         count(1) AS n_runs
        |  FROM snapshots GROUP BY 1),
        |hd AS (SELECT max(last_day) AS fleet_latest FROM pn)
        |SELECT node_id, first_day, last_day, n_runs,
        |  CAST(date_diff('day', first_day, last_day) + 1 AS BIGINT) AS n_expected,
        |  CAST(date_diff('day', first_day, last_day) + 1 - n_runs AS BIGINT) AS n_missed,
        |  CAST(n_runs AS DOUBLE)
        |    / CAST(date_diff('day', first_day, last_day) + 1 AS DOUBLE) AS adherence,
        |  last_day + 1 AS next_due,
        |  fleet_latest + 1 AS audit_day,
        |  CAST(greatest(date_diff('day', last_day + 1, fleet_latest + 1), 0) AS BIGINT)
        |    AS overdue_days,
        |  greatest(date_diff('day', last_day + 1, fleet_latest + 1), 0) > 0 AS overdue
        |FROM pn, hd ORDER BY node_id""".stripMargin),

    "b46_retry_budget" -> (cte +
      """, agg AS (
        |  SELECT node_id, snapshot_day, count(1) AS n_files,
        |    count(CASE WHEN upload_hash <> download_hash THEN 1 END) AS n_failed,
        |    sum(size) AS sz,
        |    coalesce(sum(CASE WHEN upload_hash <> download_hash THEN size END),
        |             CAST(0 AS DECIMAL(18,2))) AS fsz
        |  FROM manifest GROUP BY 1, 2)
        |SELECT node_id, snapshot_day, n_files, n_failed,
        |  CAST(fsz AS DOUBLE) AS failed_bytes,
        |  CAST(ceil(CAST(sz AS DOUBLE) / 25.0) AS BIGINT) AS nominal_sec,
        |  n_failed * 30 AS sleep_linear_sec,
        |  n_failed * 70 AS sleep_exp_sec,
        |  CAST(ceil(CAST(fsz AS DOUBLE) * 3 / 25.0) AS BIGINT) AS retransfer_sec,
        |  CAST(ceil(CAST(sz AS DOUBLE) / 25.0) AS BIGINT) + n_failed * 70
        |    + CAST(ceil(CAST(fsz AS DOUBLE) * 3 / 25.0) AS BIGINT) AS worst_total_sec,
        |  CAST(n_failed * 70 + CAST(ceil(CAST(fsz AS DOUBLE) * 3 / 25.0) AS BIGINT)
        |       AS DOUBLE) * 100.0
        |    / CAST(ceil(CAST(sz AS DOUBLE) / 25.0) AS DOUBLE) AS overhead_pct
        |FROM agg ORDER BY node_id, snapshot_day""".stripMargin),

    "b44_fleet_liveness" -> (cte +
      s""", st AS (
         |  SELECT snapshot_day, node_id, $gossipStateDuck AS state
         |  FROM snapshots)
         |SELECT snapshot_day, node_id, state,
         |  state = 'NORMAL' AS node_up,
         |  count(CASE WHEN state = 'JOINING' THEN 1 END)
         |    OVER (PARTITION BY snapshot_day) AS n_joining,
         |  count(CASE WHEN state = 'LEAVING' THEN 1 END)
         |    OVER (PARTITION BY snapshot_day) AS n_leaving,
         |  count(CASE WHEN state = 'MOVING' THEN 1 END)
         |    OVER (PARTITION BY snapshot_day) AS n_moving,
         |  count(CASE WHEN state = 'DOWN' THEN 1 END)
         |    OVER (PARTITION BY snapshot_day) AS n_down,
         |  count(CASE WHEN state <> 'NORMAL' THEN 1 END)
         |    OVER (PARTITION BY snapshot_day) = 0 AS fleet_ready
         |FROM st ORDER BY snapshot_day, node_id""".stripMargin),

    "b42_storage_tiering" -> (cte +
      """, obj AS (
        |  SELECT object_key, keyspace, max(snapshot_day) AS last_day,
        |         arg_max(size, snapshot_day) AS cur_size
        |  FROM manifest GROUP BY 1, 2),
        |l AS (SELECT max(snapshot_day) AS latest_day FROM manifest)
        |SELECT keyspace,
        |  CASE WHEN date_diff('day', last_day, latest_day) < 3 THEN 'hot'
        |       WHEN date_diff('day', last_day, latest_day) < 10 THEN 'warm'
        |       ELSE 'cold' END AS tier,
        |  count(1) AS n_objects, CAST(sum(cur_size) AS DOUBLE) AS total_size
        |FROM obj, l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "b41_retention_curve" -> (cte +
      """, ranked AS (
        |  SELECT node_id, snapshot_day,
        |    row_number() OVER (PARTITION BY node_id ORDER BY snapshot_day DESC) AS rk
        |  FROM snapshots),
        |om AS (
        |  SELECT m.object_key, min(r.rk) AS min_rk, arg_min(m.size, r.rk) AS latest_size
        |  FROM manifest m
        |  JOIN ranked r ON m.node_id = r.node_id AND m.snapshot_day = r.snapshot_day
        |  GROUP BY 1),
        |ex AS (
        |  SELECT om.min_rk, om.latest_size, k.keep_last
        |  FROM om, UNNEST([1, 2, 3, 5]) AS k(keep_last))
        |SELECT keep_last,
        |  count(CASE WHEN min_rk > keep_last THEN 1 END) AS n_reclaimable,
        |  CAST(COALESCE(sum(CASE WHEN min_rk > keep_last THEN latest_size END), 0) AS DOUBLE) AS reclaim_bytes
        |FROM ex GROUP BY 1 ORDER BY 1""".stripMargin),

    "b07_pit_state" -> (cte +
      """SELECT node_id, k, event_id, CAST(size AS DOUBLE) AS size FROM (
        |  SELECT node_id, regexp_extract(props, '([0-9]+)', 1) AS k, event_id, size,
        |    ROW_NUMBER() OVER (PARTITION BY node_id, regexp_extract(props, '([0-9]+)', 1)
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM ledger WHERE ts <= TIMESTAMP '2024-01-15 12:00:00') t
        |WHERE rn = 1 ORDER BY node_id, k""".stripMargin),

    "b08_hash_verify" -> (cte +
      """SELECT snapshot_day, object_key, node_id, upload_hash, download_hash
        |FROM manifest WHERE upload_hash <> download_hash
        |ORDER BY snapshot_day, object_key""".stripMargin),

    "b09_chunking" -> (cte +
      """SELECT node_id,
        |  CAST(SUM(GREATEST(1, CAST(CEIL(CAST(size AS DOUBLE) / 10.0) AS BIGINT))) AS BIGINT) AS total_parts,
        |  COUNT(1) AS n_files,
        |  CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM manifest GROUP BY node_id ORDER BY node_id""".stripMargin),

    "b10_topology" -> (cte +
      """SELECT concat('dc', CAST(node_id % 3 AS VARCHAR)) AS dc,
        |  COUNT(DISTINCT node_id) AS n_nodes,
        |  COUNT(1) AS n_entries,
        |  CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM ledger GROUP BY 1 ORDER BY dc""".stripMargin),

    "b11_table_rename" -> (cte +
      """SELECT object_key, keyspace, table_name,
        |  replace(object_key, concat('/', keyspace, '/'), concat('/', keyspace, '_restored/')) AS renamed_key,
        |  node_id, CAST(size AS DOUBLE) AS size
        |FROM manifest WHERE snapshot_day = DATE '2024-01-10'
        |ORDER BY object_key""".stripMargin),

    "b14_entities_filter" -> (cte +
      """SELECT concat(keyspace, '.', table_name) AS entity, snapshot_day,
        |  COUNT(1) AS n_files, CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM manifest
        |WHERE concat(keyspace, '.', table_name) IN ('ks0.tab1', 'ks1.tab3', 'ks2.tab5')
        |GROUP BY 1, 2 ORDER BY entity, snapshot_day""".stripMargin),

    "b13_remove_oldest" -> (cte +
      """SELECT object_key, node_id, CAST(size AS DOUBLE) AS size,
        |  CASE WHEN n_refs = 1 THEN 1 ELSE 0 END AS deletable
        |FROM (SELECT m.*, COUNT(1) OVER (PARTITION BY object_key) AS n_refs
        |      FROM manifest m) t
        |WHERE snapshot_day = (SELECT min(snapshot_day) FROM manifest)
        |ORDER BY object_key""".stripMargin),

    "b19_sstable_gen" -> (cte +
      """, parsed AS (
        |  SELECT keyspace, table_name, node_id,
        |    CAST(regexp_extract(object_key, 'sst_([0-9]+)$', 1) AS BIGINT) AS gen,
        |    CAST(regexp_extract(object_key, '^node([0-9]+)/', 1) AS BIGINT) AS node_parsed
        |  FROM manifest
        |)
        |SELECT keyspace, table_name, MAX(gen) AS max_gen,
        |  COUNT(DISTINCT gen) AS n_generations, COUNT(1) AS n_sstables,
        |  COUNT(DISTINCT node_parsed) AS n_nodes,
        |  COUNT(CASE WHEN node_parsed = node_id THEN 1 END) AS n_parse_ok
        |FROM parsed GROUP BY keyspace, table_name
        |ORDER BY keyspace, table_name""".stripMargin),

    "b18_remote_inventory" -> (cte +
      """, inv AS (
        |  SELECT DISTINCT object_key FROM ledger
        |  WHERE snapshot_day < DATE '2024-01-10' AND event_id % 3 <> 0
        |)
        |SELECT object_key, keyspace, table_name, node_id, CAST(size AS DOUBLE) AS size
        |FROM manifest m
        |WHERE snapshot_day = DATE '2024-01-10'
        |  AND NOT EXISTS (SELECT 1 FROM inv WHERE inv.object_key = m.object_key)
        |ORDER BY object_key""".stripMargin),

    "b15_token_check" -> (cte +
      s"""SELECT node_id, snapshot_day,
         |  ${tokenHashDuck(target = false)} AS backup_hash,
         |  ${tokenHashDuck(target = true)} AS target_hash,
         |  CASE WHEN ${tokenHashDuck(target = false)}
         |          = ${tokenHashDuck(target = true)}
         |       THEN 1 ELSE 0 END AS tokens_match
         |FROM snapshots ORDER BY node_id, snapshot_day""".stripMargin),

    "b21_bandwidth_plan" -> (cte +
      """SELECT node_id, object_key, CAST(size AS DOUBLE) AS size,
        |  CAST(CEIL(CAST(size AS DOUBLE) / 25.0) AS BIGINT) AS est_sec,
        |  CAST(SUM(CAST(CEIL(CAST(size AS DOUBLE) / 25.0) AS BIGINT))
        |    OVER (PARTITION BY node_id ORDER BY object_key
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS finish_offset_sec
        |FROM manifest WHERE snapshot_day = DATE '2024-01-10'
        |ORDER BY node_id, object_key""".stripMargin),

    "b34_restore_plan" -> (cte +
      s""", resolved AS (
         |  SELECT node_id, max(snapshot_day) AS snapshot_day
         |  FROM manifest WHERE snapshot_day <= DATE '2024-01-12'
         |  GROUP BY 1),
         |slice AS (
         |  SELECT m.* FROM manifest m JOIN resolved r
         |    ON m.node_id = r.node_id AND m.snapshot_day = r.snapshot_day),
         |ranked AS (
         |  SELECT node_id, snapshot_day, size, upload_hash, download_hash,
         |    CAST((ROW_NUMBER() OVER (PARTITION BY node_id
         |      ORDER BY size DESC, object_key) - 1) % 4 AS INT) AS worker
         |  FROM slice),
         |workers AS (
         |  SELECT node_id, snapshot_day, worker,
         |    count(1) AS nf, sum(size) AS b,
         |    COUNT(CASE WHEN upload_hash <> download_hash THEN 1 END) AS nm
         |  FROM ranked GROUP BY 1, 2, 3),
         |hg AS (
         |  SELECT node_id, snapshot_day,
         |    CAST(sum(nf) AS BIGINT) AS n_files,
         |    CAST(sum(b) AS DOUBLE) AS bytes,
         |    CAST(max(CAST(ceil(CAST(b AS DOUBLE) / 25.0) AS BIGINT)) AS BIGINT) AS makespan0,
         |    CAST(sum(nm) AS BIGINT) AS n_hash_mismatch
         |  FROM workers GROUP BY 1, 2),
         |tg AS (
         |  SELECT node_id, snapshot_day,
         |    ${tokenHashDuck(target = false)} = ${tokenHashDuck(target = true)} AS tokens_match,
         |    $schemaVerDuck AS sv,
         |    ($gossipStateDuck) = 'NORMAL' AS node_up
         |  FROM snapshots),
         |vg AS (
         |  SELECT snapshot_day, COUNT(DISTINCT sv) AS n_versions
         |  FROM tg GROUP BY 1),
         |mj AS (
         |  SELECT snapshot_day, sv AS maj_sv FROM (
         |    SELECT snapshot_day, sv,
         |      ROW_NUMBER() OVER (PARTITION BY snapshot_day
         |        ORDER BY count(1) DESC, sv DESC) AS rn
         |    FROM tg GROUP BY snapshot_day, sv) x
         |  WHERE rn = 1),
         |fg AS (
         |  SELECT snapshot_day,
         |    count(CASE WHEN NOT node_up THEN 1 END) = 0 AS fleet_ready
         |  FROM tg GROUP BY 1)
         |SELECT h.node_id, h.snapshot_day, h.n_files, h.bytes,
         |  h.n_hash_mismatch, t.tokens_match, v.n_versions,
         |  t.sv = m.maj_sv AS schema_ok, t.node_up, f.fleet_ready,
         |  (h.n_hash_mismatch = 0 AND t.tokens_match AND t.sv = m.maj_sv
         |   AND t.node_up) AS ready,
         |  CASE WHEN h.n_hash_mismatch = 0 AND t.tokens_match AND t.sv = m.maj_sv
         |            AND t.node_up
         |       THEN h.makespan0 END AS makespan_sec
         |FROM hg h
         |JOIN tg t ON h.node_id = t.node_id AND h.snapshot_day = t.snapshot_day
         |JOIN vg v ON h.snapshot_day = v.snapshot_day
         |JOIN mj m ON h.snapshot_day = m.snapshot_day
         |JOIN fg f ON h.snapshot_day = f.snapshot_day
         |ORDER BY h.node_id""".stripMargin),

    "b33_restore_workers" -> (cte +
      """, latest AS (
        |  SELECT node_id, max(snapshot_day) AS snapshot_day
        |  FROM manifest GROUP BY 1),
        |tgt AS (
        |  SELECT m.node_id, m.object_key, m.size,
        |    ROW_NUMBER() OVER (PARTITION BY m.node_id
        |      ORDER BY m.size DESC, m.object_key) AS rk
        |  FROM manifest m JOIN latest l
        |    ON m.node_id = l.node_id AND m.snapshot_day = l.snapshot_day),
        |grp AS (
        |  SELECT node_id, CAST((rk - 1) % 4 AS INT) AS worker,
        |    count(1) AS n_files, sum(size) AS bytes_dec
        |  FROM tgt GROUP BY 1, 2),
        |est AS (
        |  SELECT node_id, worker, n_files,
        |    CAST(bytes_dec AS DOUBLE) AS bytes,
        |    CAST(ceil(CAST(bytes_dec AS DOUBLE) / 25.0) AS BIGINT) AS est_sec
        |  FROM grp)
        |SELECT node_id, worker, n_files, bytes, est_sec,
        |  CAST(max(est_sec) OVER (PARTITION BY node_id) AS BIGINT) AS node_makespan,
        |  CAST(max(est_sec) OVER (PARTITION BY node_id) AS DOUBLE)
        |    * count(1) OVER (PARTITION BY node_id)
        |    / sum(est_sec) OVER (PARTITION BY node_id) AS balance
        |FROM est ORDER BY node_id, worker""".stripMargin),

    "b32_compaction_plan" -> (cte +
      """, files AS (
        |  SELECT node_id, keyspace, table_name, object_key,
        |    CAST(size * 100 AS BIGINT) AS size_cents,
        |    COALESCE(SUM(CAST(size * 100 AS BIGINT)) OVER (
        |      PARTITION BY node_id, keyspace, table_name ORDER BY object_key
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM manifest WHERE snapshot_day = DATE '2024-01-10')
        |SELECT node_id, keyspace, table_name,
        |  CAST(cum_before // 50000 AS BIGINT) AS bin,
        |  count(1) AS n_files,
        |  CAST(sum(size_cents) AS BIGINT) AS bin_cents,
        |  min(object_key) AS first_key, max(object_key) AS last_key
        |FROM files GROUP BY 1, 2, 3, 4
        |ORDER BY node_id, keyspace, table_name, bin""".stripMargin),

    "b20_restore_readiness" -> (cte +
      s""", h AS (
         |  SELECT snapshot_day,
         |    COUNT(CASE WHEN upload_hash <> download_hash THEN 1 END) AS n_hash_mismatch
         |  FROM manifest GROUP BY snapshot_day
         |),
         |t AS (
         |  SELECT snapshot_day,
         |    COUNT(CASE WHEN ${tokenHashDuck(target = false)}
         |               <> ${tokenHashDuck(target = true)} THEN 1 END) AS n_token_mismatch
         |  FROM snapshots GROUP BY snapshot_day
         |),
         |sc AS (
         |  SELECT snapshot_day, COUNT(DISTINCT $schemaVerDuck) AS n_versions
         |  FROM snapshots GROUP BY snapshot_day
         |)
         |SELECT h.snapshot_day, h.n_hash_mismatch, t.n_token_mismatch, sc.n_versions,
         |  CASE WHEN h.n_hash_mismatch = 0 AND t.n_token_mismatch = 0 AND sc.n_versions = 1
         |       THEN 1 ELSE 0 END AS ready
         |FROM h JOIN t USING (snapshot_day) JOIN sc USING (snapshot_day)
         |ORDER BY snapshot_day""".stripMargin),

    "b16_schema_versions" -> (cte +
      s""", sv AS (
        |  SELECT snapshot_day, node_id, $schemaVerDuck AS sv
        |  FROM snapshots
        |)
        |SELECT snapshot_day, COUNT(DISTINCT sv) AS n_versions,
        |  MIN(sv) AS min_version, MAX(sv) AS max_version,
        |  COUNT(DISTINCT node_id) AS n_nodes,
        |  CASE WHEN COUNT(DISTINCT sv) = 1 THEN 1 ELSE 0 END AS agreement
        |FROM sv GROUP BY snapshot_day ORDER BY snapshot_day""".stripMargin),

    "b17_topology_full" -> (cte +
      """SELECT dc, COALESCE(rack, 'ALL') AS rack, COALESCE(endpoint, 'ALL') AS endpoint,
        |  COUNT(DISTINCT node_id) AS n_nodes, COUNT(1) AS n_entries,
        |  CAST(SUM(size) AS DOUBLE) AS total_size
        |FROM (SELECT node_id, size,
        |        concat('dc', CAST(node_id % 3 AS VARCHAR)) AS dc,
        |        concat('r', CAST((node_id // 3) % 2 AS VARCHAR)) AS rack,
        |        concat('10.', CAST(node_id % 3 AS VARCHAR), '.', CAST((node_id // 3) % 2 AS VARCHAR), '.', CAST(node_id AS VARCHAR)) AS endpoint
        |      FROM ledger) t
        |GROUP BY GROUPING SETS ((dc), (dc, rack), (dc, rack, endpoint))
        |ORDER BY dc, rack, endpoint""".stripMargin),

    "b22_manifest_ingest" -> (cte +
      s"""SELECT snapshot_day,
         |  COUNT(DISTINCT node_id) AS n_manifests,
         |  COUNT(1) AS n_files,
         |  CAST(SUM(size) AS DOUBLE) AS total_size,
         |  COUNT(DISTINCT concat(keyspace, '.', table_name)) AS n_tables,
         |  COUNT(DISTINCT $schemaVerDuck) AS n_versions,
         |  CAST(8 AS BIGINT) AS min_tokens
         |FROM manifest GROUP BY snapshot_day ORDER BY snapshot_day""".stripMargin),

    "b23_pit_diff" -> (cte +
      """, ev AS (
        |  SELECT node_id, COALESCE(regexp_extract(props, '([0-9]+)', 1), '') AS k, ts, event_id, size, ftype
        |  FROM ledger WHERE ts <= TIMESTAMP '2024-01-15 12:00:00'
        |),
        |s2 AS (
        |  SELECT node_id, k, event_id, size, ftype FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id, k ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev) t
        |  WHERE rn = 1
        |),
        |s1 AS (
        |  SELECT node_id, k, event_id, size, ftype FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY node_id, k ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM ev WHERE ts <= TIMESTAMP '2024-01-08 12:00:00') t
        |  WHERE rn = 1
        |),
        |st AS (
        |  SELECT s2.node_id, s2.k,
        |    (s1.event_id IS NOT NULL AND s1.ftype <> 'COMMIT_LOG') AS p1,
        |    (s2.ftype <> 'COMMIT_LOG') AS p2,
        |    s1.event_id AS e1, s2.event_id AS e2, s1.size AS z1, s2.size AS z2
        |  FROM s2 LEFT JOIN s1 ON s1.node_id = s2.node_id AND s1.k = s2.k
        |),
        |cls AS (
        |  SELECT node_id, k,
        |    CASE WHEN NOT p1 AND p2 THEN 'added'
        |         WHEN p1 AND NOT p2 THEN 'removed'
        |         WHEN p1 AND p2 AND e1 <> e2 THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    CASE WHEN p1 THEN e1 END AS old_event_id,
        |    CASE WHEN p2 THEN e2 END AS new_event_id,
        |    CASE WHEN p1 THEN CAST(z1 AS DOUBLE) END AS old_size,
        |    CASE WHEN p2 THEN CAST(z2 AS DOUBLE) END AS new_size
        |  FROM st
        |)
        |SELECT node_id, k, status, old_event_id, new_event_id, old_size, new_size
        |FROM cls WHERE status IN ('added', 'removed', 'changed')
        |ORDER BY node_id, k""".stripMargin),

    "b24_storage_locations" -> (cte +
      """, locs AS (
        |  SELECT node_id, size,
        |    concat(CASE CAST(node_id % 4 AS INT) WHEN 0 THEN 's3' WHEN 1 THEN 'gcp' WHEN 2 THEN 'azure' ELSE 'file' END,
        |      '://bkt', CAST(node_id % 2 AS VARCHAR),
        |      '/cluster1/dc', CAST(node_id % 3 AS VARCHAR),
        |      '/node', CAST(node_id AS VARCHAR)) AS location
        |  FROM ledger
        |),
        |parsed AS (
        |  SELECT node_id, size,
        |    regexp_extract(location, '^([a-z0-9]+)://', 1) AS proto,
        |    regexp_extract(location, '^[a-z0-9]+://([^/]+)/', 1) AS bucket,
        |    regexp_extract(location, '/(dc[0-9]+)/', 1) AS dc_parsed,
        |    CAST(regexp_extract(location, '/node([0-9]+)$', 1) AS BIGINT) AS node_parsed
        |  FROM locs
        |)
        |SELECT proto, bucket,
        |  COUNT(DISTINCT node_parsed) AS n_nodes,
        |  COUNT(DISTINCT dc_parsed) AS n_dcs,
        |  COUNT(1) AS n_files,
        |  CAST(SUM(size) AS DOUBLE) AS total_size,
        |  COUNT(CASE WHEN node_parsed = node_id THEN 1 END) AS n_parse_ok
        |FROM parsed GROUP BY proto, bucket
        |ORDER BY proto, bucket""".stripMargin),

    "b12_asof_join" -> (cte +
      """SELECT l.event_id, l.node_id, l.snapshot_day AS request_day,
        |  (SELECT max(sn.snapshot_day) FROM snapshots sn
        |   WHERE sn.node_id = l.node_id AND sn.snapshot_day < l.snapshot_day) AS matched_day
        |FROM ledger l WHERE l.ftype = 'COMMIT_LOG'
        |ORDER BY l.event_id""".stripMargin),

    "b25_fetch_plan" -> (cte +
      """, latest AS (
        |  SELECT node_id, max(snapshot_day) AS snapshot_day FROM manifest GROUP BY 1),
        |target AS (
        |  SELECT m.* FROM manifest m JOIN latest USING (node_id, snapshot_day)),
        |firsts AS (
        |  SELECT node_id, object_key, min(snapshot_day) AS src_day
        |  FROM manifest GROUP BY 1, 2)
        |SELECT t.node_id, f.src_day, count(1) AS n_files,
        |  CAST(sum(t.size) AS DOUBLE) AS bytes
        |FROM target t JOIN firsts f USING (node_id, object_key)
        |GROUP BY 1, 2 ORDER BY node_id, src_day""".stripMargin),

    "b26_progress" -> (cte +
      """, st AS (
        |  SELECT node_id, snapshot_day,
        |    CASE WHEN event_id % 41 = 0 THEN 'FAILED'
        |         WHEN event_id % 37 = 0 THEN 'IGNORED'
        |         WHEN ts <= TIMESTAMP '2024-01-15 12:00:00' THEN 'FINISHED'
        |         ELSE 'NOT_STARTED' END AS state
        |  FROM ledger)
        |SELECT node_id, snapshot_day,
        |  count(1) AS n_units,
        |  count(CASE WHEN state = 'FINISHED' THEN 1 END) AS n_finished,
        |  count(CASE WHEN state = 'FAILED' THEN 1 END) AS n_failed,
        |  count(CASE WHEN state = 'IGNORED' THEN 1 END) AS n_ignored,
        |  CAST(count(CASE WHEN state = 'FINISHED' THEN 1 END) AS DOUBLE)
        |    / count(1) AS progress,
        |  count(CASE WHEN state = 'FAILED' THEN 1 END) = 0
        |    AND count(CASE WHEN state = 'FINISHED' THEN 1 END)
        |      + count(CASE WHEN state = 'IGNORED' THEN 1 END) = count(1) AS complete
        |FROM st GROUP BY 1, 2 ORDER BY node_id, snapshot_day""".stripMargin),

    "b27_local_resolve" -> (cte +
      s""", latest AS (
         |  SELECT node_id, max(snapshot_day) AS snapshot_day FROM manifest GROUP BY 1),
         |target AS (
         |  SELECT m.*,
         |    CAST(regexp_extract(m.object_key, 'sst_([0-9]+)$$', 1) AS BIGINT) AS k,
         |    regexp_extract(m.object_key, '([^/]+)$$', 1) AS filename,
         |    ${graft.model.Corpus.hash32Sql("concat(m.keyspace, '.', m.table_name)")} % 3 = 0 AS recreated,
         |    substr(md5(concat(m.keyspace, '.', m.table_name, '#gen0')), 1, 8) AS manifest_tid,
         |    substr(md5(concat(m.keyspace, '.', m.table_name, '#gen1')), 1, 8) AS tid1
         |  FROM manifest m JOIN latest USING (node_id, snapshot_day))
         |SELECT node_id, object_key, keyspace, table_name, manifest_tid,
         |  CASE WHEN recreated THEN tid1 ELSE manifest_tid END AS local_tid,
         |  recreated AS id_changed,
         |  k % 11 = 0 AS is_index,
         |  concat(keyspace, '/', table_name, '-',
         |    CASE WHEN recreated THEN tid1 ELSE manifest_tid END, '/',
         |    CASE WHEN k % 11 = 0 THEN concat('.idx', CAST(k % 2 AS VARCHAR), '/') ELSE '' END,
         |    filename) AS local_file
         |FROM target ORDER BY node_id, object_key""".stripMargin),

    "b28_commitlog_fetch" -> (cte +
      """, segs AS (
        |  SELECT node_id, event_id, epoch_us(ts) AS mtime,
        |    concat('commitlog/CommitLog-7-', CAST(event_id AS VARCHAR),
        |           '.log.', CAST(epoch_us(ts) AS VARCHAR)) AS seg_key
        |  FROM ledger WHERE ftype = 'COMMIT_LOG'),
        |w AS (
        |  SELECT node_id, seg_key, mtime, 'window' AS reason FROM segs
        |  WHERE mtime >= epoch_us(TIMESTAMP '2024-01-10 00:00:00')
        |    AND mtime <= epoch_us(TIMESTAMP '2024-01-20 00:00:00')),
        |o AS (
        |  SELECT node_id, seg_key, mtime, 'overhang' AS reason FROM (
        |    SELECT *, row_number() OVER (PARTITION BY node_id
        |      ORDER BY mtime, event_id) AS rn
        |    FROM segs
        |    WHERE mtime > epoch_us(TIMESTAMP '2024-01-20 00:00:00')) t
        |  WHERE rn = 1)
        |SELECT node_id, seg_key, mtime, reason
        |FROM (SELECT * FROM w UNION ALL SELECT * FROM o) u
        |ORDER BY node_id, mtime, seg_key""".stripMargin),

    "b29_growth_trend" -> (cte +
      """, daily AS (
        |  SELECT node_id, snapshot_day,
        |    CAST(sum(CAST(size * 100 AS BIGINT)) AS BIGINT) AS cents,
        |    CAST(datediff('day', DATE '2024-01-01', snapshot_day) AS BIGINT) AS x
        |  FROM ledger GROUP BY node_id, snapshot_day),
        |sums AS (
        |  -- sums stay HUGEINT (exact int128) — the twin of Spark's
        |  -- decimal(38,0); BIGINT would overflow at fleet scale
        |  SELECT node_id, count(1) AS n_days,
        |    sum(x) AS sx,
        |    sum(cents) AS sy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(x AS HUGEINT) * cents) AS sxy
        |  FROM daily GROUP BY node_id)
        |SELECT node_id, n_days,
        |  CAST(sy AS DOUBLE) / 100 / n_days AS mean_daily_bytes,
        |  CAST(n_days * sxy - sx * sy AS DOUBLE)
        |    / CAST(n_days * sxx - sx * sx AS DOUBLE) / 100 AS slope_bytes_per_day
        |FROM sums ORDER BY node_id""".stripMargin),

    "b30_topology_remap" -> (cte + {
      val srcTok = graft.model.Corpus.hash32Sql(
        "concat('tok', CAST(node_id AS VARCHAR), '_', CAST(i AS VARCHAR))")
      val tgtTok = graft.model.Corpus.hash32Sql(
        "concat('ttok', CAST(t_node AS VARCHAR), '_', CAST(i AS VARCHAR))")
      s""", src AS (SELECT DISTINCT node_id FROM snapshots),
         |srctok AS (
         |  SELECT node_id, $srcTok AS token
         |  FROM src, UNNEST(range(0, 8)) t(i)),
         |tgt AS (
         |  SELECT t_node, $tgtTok AS t_token
         |  FROM (SELECT unnest(range(0, 7)) AS t_node), UNNEST(range(0, 8)) t(i)),
         |stream AS (
         |  SELECT t_token AS token, 1 AS is_tgt, t_node, CAST(NULL AS BIGINT) AS src_node FROM tgt
         |  UNION ALL
         |  SELECT token, 0, CAST(NULL AS BIGINT), node_id FROM srctok),
         |owned AS (
         |  SELECT *, last_value(t_node IGNORE NULLS) OVER (
         |      ORDER BY token DESC, is_tgt DESC, t_node DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS owner0
         |  FROM stream),
         |wrap AS (SELECT t_node AS wrap_node FROM tgt ORDER BY t_token ASC, t_node ASC LIMIT 1),
         |counts AS (
         |  SELECT src_node, COALESCE(owner0, (SELECT wrap_node FROM wrap)) AS owner,
         |         count(1) AS n_owned
         |  FROM owned WHERE is_tgt = 0 GROUP BY 1, 2)
         |SELECT node_id, target_node, n_owned_vnodes, n_vnodes FROM (
         |  SELECT src_node AS node_id, owner AS target_node,
         |    CAST(n_owned AS BIGINT) AS n_owned_vnodes,
         |    CAST(sum(n_owned) OVER (PARTITION BY src_node) AS BIGINT) AS n_vnodes,
         |    ROW_NUMBER() OVER (PARTITION BY src_node ORDER BY n_owned DESC, owner ASC) AS rn
         |  FROM counts) t
         |WHERE rn = 1 ORDER BY node_id""".stripMargin
    }),

    "b31_sync_plan" -> (cte + {
      val orphanSel = graft.model.Corpus.hash32Sql("concat('o#', object_key)")
      val staleSel = graft.model.Corpus.hash32Sql("concat('stale#', object_key)")
      s""", m AS (SELECT * FROM manifest WHERE ftype <> 'CQL_SCHEMA'),
         |latest AS (SELECT node_id, max(snapshot_day) AS d FROM m GROUP BY 1),
         |target AS (
         |  SELECT m.node_id, m.object_key, m.upload_hash, m.size
         |  FROM m JOIN latest l ON m.node_id = l.node_id AND m.snapshot_day = l.d),
         |prevrows AS (
         |  SELECT m.*, ROW_NUMBER() OVER (
         |      PARTITION BY m.node_id, m.object_key
         |      ORDER BY m.snapshot_day DESC) AS rn
         |  FROM m JOIN latest l ON m.node_id = l.node_id AND m.snapshot_day < l.d),
         |pm AS (SELECT * FROM prevrows WHERE rn = 1),
         |localfs AS (
         |  SELECT node_id, object_key,
         |    CASE WHEN ${staleSel} % 13 = 0 THEN md5(concat('stale#', object_key))
         |         ELSE download_hash END AS local_hash
         |  FROM pm
         |  UNION ALL
         |  SELECT node_id, object_key || '.orphan', download_hash FROM pm
         |  WHERE $orphanSel % 7 = 0),
         |sync AS (
         |  SELECT COALESCE(t.node_id, lf.node_id) AS node_id,
         |    CASE WHEN lf.local_hash IS NULL THEN 'download'
         |         WHEN t.upload_hash IS NULL THEN 'delete_untracked'
         |         WHEN t.upload_hash <> lf.local_hash THEN 'delete_mismatch'
         |         ELSE 'keep' END AS action,
         |    t.size
         |  FROM target t FULL OUTER JOIN localfs lf
         |    ON t.node_id = lf.node_id AND t.object_key = lf.object_key)
         |SELECT node_id, action, count(1) AS n_files,
         |  CAST(sum(COALESCE(size, 0)) AS DOUBLE) AS bytes
         |FROM sync GROUP BY 1, 2 ORDER BY node_id, action""".stripMargin
    }),

    "b35_rpo_compliance" -> (cte +
      """, daily AS (
        |  SELECT node_id, keyspace, snapshot_day,
        |    count(CASE WHEN upload_hash <> download_hash THEN 1 END) AS n_bad
        |  FROM manifest GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT node_id, keyspace,
        |    max(CASE WHEN n_bad = 0 THEN snapshot_day END) AS last_ok_day,
        |    CAST(sum(n_bad) AS BIGINT) AS n_corrupt,
        |    count(1) AS n_days
        |  FROM daily GROUP BY 1, 2)
        |SELECT node_id, keyspace, last_ok_day, n_corrupt, n_days,
        |  CAST(date_diff('day', last_ok_day, DATE '2024-01-31') AS BIGINT) AS lag_days,
        |  CAST(CASE keyspace WHEN 'ks0' THEN 1 WHEN 'ks1' THEN 3 ELSE 7 END AS BIGINT) AS rpo_days,
        |  CASE WHEN last_ok_day IS NULL
        |         OR date_diff('day', last_ok_day, DATE '2024-01-31')
        |            > CASE keyspace WHEN 'ks0' THEN 1 WHEN 'ks1' THEN 3 ELSE 7 END
        |       THEN 'VIOLATION' ELSE 'OK' END AS status
        |FROM agg ORDER BY node_id, keyspace""".stripMargin),

    "b36_verify_sample" -> (cte +
      """, latest AS (SELECT max(snapshot_day) AS snapshot_day FROM manifest),
        |ranked AS (
        |  SELECT m.node_id, m.keyspace, m.table_name, m.object_key,
        |    m.size, m.upload_hash, m.download_hash,
        |    ROW_NUMBER() OVER (PARTITION BY m.node_id, m.keyspace, m.table_name
        |      ORDER BY md5(concat('vs', m.object_key)), m.object_key) AS rk
        |  FROM manifest m JOIN latest USING (snapshot_day))
        |SELECT node_id, keyspace, table_name, object_key,
        |  CAST(rk AS INT) AS rk, CAST(size AS DOUBLE) AS size,
        |  upload_hash = download_hash AS hash_ok
        |FROM ranked WHERE rk <= 2
        |ORDER BY node_id, keyspace, table_name, rk""".stripMargin),

    "b37_orphan_gc" -> (cte +
      """, per_obj AS (
        |  SELECT object_key, keyspace, table_name,
        |    arg_min(size, snapshot_day) AS first_size,
        |    max(snapshot_day) AS last_day
        |  FROM manifest GROUP BY 1, 2, 3)
        |SELECT keyspace, table_name, COUNT(1) AS n_objects,
        |  COUNT(CASE WHEN last_day < DATE '2024-01-08' THEN 1 END) AS n_deletable,
        |  CAST(COALESCE(SUM(CASE WHEN last_day < DATE '2024-01-08' THEN first_size END), 0) AS DOUBLE) AS bytes_reclaimed
        |FROM per_obj GROUP BY 1, 2 ORDER BY keyspace, table_name""".stripMargin),

    "b38_backup_streaks" -> (cte +
      """, anchored AS (
        |  SELECT node_id, snapshot_day,
        |    snapshot_day - CAST(ROW_NUMBER() OVER (PARTITION BY node_id
        |      ORDER BY snapshot_day) AS INT) AS anchor
        |  FROM snapshots)
        |SELECT node_id, min(snapshot_day) AS streak_start,
        |  max(snapshot_day) AS streak_end, count(1) AS streak_len
        |FROM anchored GROUP BY node_id, anchor
        |ORDER BY node_id, streak_start""".stripMargin),

    "b39_manifest_export" -> (cte +
      s""", ent AS (
         |  SELECT node_id, snapshot_day,
         |    '{"key":"' || object_key || '","size":' || CAST(size AS VARCHAR)
         |      || ',"hash":"' || upload_hash || '"}' AS e
         |  FROM manifest),
         |agg AS (
         |  SELECT node_id, snapshot_day, count(1) AS n_entries,
         |    string_agg(e, ',' ORDER BY e) AS ej
         |  FROM ent GROUP BY 1, 2),
         |docs2 AS (
         |  SELECT node_id, snapshot_day, n_entries,
         |    '{"snapshot":"snap-' || CAST(snapshot_day AS VARCHAR)
         |      || '","node":' || CAST(node_id AS VARCHAR)
         |      || ',"schemaVersion":"' || $schemaVerDuck
         |      || '","entries":[' || ej || ']}' AS doc
         |  FROM agg)
         |SELECT node_id, snapshot_day, n_entries,
         |  CAST(length(doc) AS BIGINT) AS manifest_len, md5(doc) AS manifest_md5
         |FROM docs2 ORDER BY node_id, snapshot_day""".stripMargin)
  )
}
