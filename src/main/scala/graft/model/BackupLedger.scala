package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** The backup ledger: esop's manifest/snapshot data model derived from
  * the shared `events` table (SURVEY §1).
  *
  * Mapping (deterministic, SQL-expressible so the DuckDB oracle can
  * mirror it exactly):
  *   - node            = `user_id` (a Cassandra node uploading SSTables)
  *   - snapshot        = `day(ts)` (one backup per cluster per day)
  *   - object_key      = `node<user>/ks<k%3>/tab<k%7>/sst_<k>` with
  *                       k = event_id % 97 — the bounded key space
  *                       makes the same file recur across snapshots,
  *                       which is what drives esop's incremental
  *                       upload / reclaimable-space math (reference:
  *                       `impl/ManifestEntry.java:18-97`,
  *                       `impl/Manifest.java:461-483`)
  *   - keyspace/table  = `ks<k%3>` / `tab<k%7>` — the entity dimension
  *                       every esop operation filters by (`--entities`,
  *                       `impl/DatabaseEntities.java:121`,
  *                       `ManifestEntry.java:52`); derived from the
  *                       sstable number so each object_key belongs to
  *                       exactly one ks.table
  *   - size            = `value` as DECIMAL(18,2) (exact arithmetic)
  *   - ftype           = event_type → esop `ManifestEntry.Type`
  *   - upload_hash     = md5(object_key); download_hash corrupted for
  *                       `event_id % 53 == 0` rows to exercise the hash
  *                       verifier (`impl/hash/HashServiceImpl.java`)
  *
  * Scale: the ledger is a projection over the raw scan — no shuffle.
  * `manifest` dedupes per (snapshot, key) with a window partitioned by
  * those bounded keys; at 100 TB this is one shuffle on the natural
  * manifest key, and every downstream §2.B operator reuses it.
  */
object BackupLedger {

  /** Bounded sstable number; keyspace/table derive from it so one
    * object_key always belongs to one ks.table (as esop's
    * `ManifestEntry.keyspaceTable` does, `impl/ManifestEntry.java:52`). */
  private def kNum = col("event_id") % 97

  private def keyExpr = concat(
    lit("node"), col("user_id").cast("string"),
    lit("/ks"), (kNum % 3).cast("string"),
    lit("/tab"), (kNum % 7).cast("string"),
    lit("/sst_"), kNum.cast("string"))

  /** Raw upload ledger — one row per upload event. */
  /** event_type → esop `ManifestEntry.Type` — THE ledger mapping,
    * defined once: the live monitors (s30's completeness gate) reuse
    * this expression, so a mapping change can never silently diverge
    * batch ledger from streaming monitor. */
  val ftypeCol: Column =
    when(col("event_type") === "signup", "CQL_SCHEMA")
      .when(col("event_type") === "error", "COMMIT_LOG")
      .when(col("event_type") === "click", "MANIFEST_FILE")
      .otherwise("FILE")

  def ledger(s: SparkSession, dir: String): DataFrame =
    ledgerOf(Tables.events(s, dir))

  /** The same ledger projection over ANY frame with the events schema —
    * stateless per-row, so the STREAMING monitors (s42's live retry
    * budget) apply the one definition to the arriving feed and a
    * mapping change can never silently diverge batch ledger from live
    * monitor (the [[ftypeCol]] convention extended to the whole row). */
  def ledgerOf(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("user_id").as("node_id"),
      date_trunc("day", col("ts")).cast("date").as("snapshot_day"),
      col("ts"),
      col("props"),
      concat(lit("ks"), (kNum % 3).cast("string")).as("keyspace"),
      concat(lit("tab"), (kNum % 7).cast("string")).as("table_name"),
      keyExpr.as("object_key"),
      dec2(col("value")).as("size"),
      ftypeCol.as("ftype"),
      md5(keyExpr).as("upload_hash"),
      when(col("event_id") % 53 === 0,
        md5(concat(lit("corrupt#"), col("event_id").cast("string"))))
        .otherwise(md5(keyExpr)).as("download_hash"))

  /** Manifest entries: latest upload wins per (snapshot, object_key). */
  def manifest(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("snapshot_day", "object_key")
      .orderBy(col("event_id").desc)
    ledger(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("snapshot_day", "object_key", "keyspace", "table_name",
        "node_id", "size", "ftype", "upload_hash", "download_hash")
  }

  /** Distinct (node, snapshot_day) pairs — the per-node backup history.
    *
    * Derived from the RAW ledger, not [[manifest]]: every object_key
    * embeds its node ([[keyExpr]] prefixes `node<user_id>/`), so the
    * manifest dedupe can never drop a (node, day) pair the ledger has —
    * the two distinct sets are provably identical, and the 2-column
    * distinct is a map-side partial aggregate instead of the manifest's
    * full-row window sort (the dominant cost of b15/b16/b20 at sf0.1;
    * at 100 TB it is the difference between shuffling two columns and
    * shuffling the whole manifest). The oracle keeps `snapshots` as
    * DISTINCT over `manifest` — value-identical by the argument above. */
  def snapshots(s: SparkSession, dir: String): DataFrame =
    ledger(s, dir).select("node_id", "snapshot_day").distinct()

  /** DuckDB CTE prefix mirroring [[ledger]]/[[manifest]] exactly —
    * prepended to every §2.B oracle query. */
  val oracleCte: String = {
    val key = "concat('node', CAST(user_id AS VARCHAR)," +
      " '/ks', CAST((event_id % 97) % 3 AS VARCHAR)," +
      " '/tab', CAST((event_id % 97) % 7 AS VARCHAR)," +
      " '/sst_', CAST(event_id % 97 AS VARCHAR))"
    s"""WITH ledger AS (
      |  SELECT event_id,
      |         user_id AS node_id,
      |         CAST(date_trunc('day', ts) AS DATE) AS snapshot_day,
      |         ts,
      |         props,
      |         concat('ks', CAST((event_id % 97) % 3 AS VARCHAR)) AS keyspace,
      |         concat('tab', CAST((event_id % 97) % 7 AS VARCHAR)) AS table_name,
      |         $key AS object_key,
      |         CAST(value AS DECIMAL(18,2)) AS size,
      |         CASE event_type WHEN 'signup' THEN 'CQL_SCHEMA'
      |                         WHEN 'error' THEN 'COMMIT_LOG'
      |                         WHEN 'click' THEN 'MANIFEST_FILE'
      |                         ELSE 'FILE' END AS ftype,
      |         md5($key) AS upload_hash,
      |         CASE WHEN event_id % 53 = 0
      |              THEN md5(concat('corrupt#', CAST(event_id AS VARCHAR)))
      |              ELSE md5($key)
      |         END AS download_hash
      |  FROM events
      |),
      |manifest AS (
      |  SELECT snapshot_day, object_key, keyspace, table_name, node_id, size, ftype, upload_hash, download_hash
      |  FROM (SELECT l.*, ROW_NUMBER() OVER (PARTITION BY snapshot_day, object_key ORDER BY event_id DESC) AS rn
      |        FROM ledger l) t
      |  WHERE rn = 1
      |),
      |snapshots AS (
      |  SELECT DISTINCT node_id, snapshot_day FROM manifest
      |)
      |""".stripMargin
  }
}
