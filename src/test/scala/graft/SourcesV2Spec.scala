package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** x08 — the DataSource V2 synthetic-corpus connector: split planning,
  * filter-pushdown partition pruning, column pruning, determinism. */
class SourcesV2Spec extends SparkSpec {

  private def synth(rows: Long, parts: Int = 8): DataFrame =
    spark.read.format("graft.sources.v2.SynthSource")
      .option("rows", rows).option("partitions", parts).load()

  private def scanOf(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail(s"no BatchScanExec:\n${df.queryExecution.executedPlan}"))

  test("x08 generates the full id range across the requested splits") {
    val df = synth(10000)
    assert(df.count() == 10000)
    assert(scanOf(df).inputRDD.getNumPartitions == 8)
    val ids = df.agg(min("doc_id"), max("doc_id"), countDistinct("doc_id")).head()
    assert(ids.getLong(0) == 0 && ids.getLong(1) == 9999 && ids.getLong(2) == 10000)
  }

  test("x08 doc_id bounds prune whole splits at planning time") {
    // 8 splits of 1250; doc_id >= 7500 lies entirely in the last 2 —
    // the other 6 must never be planned, and the pushed bound must be
    // exact (no post-scan residual re-filter needed)
    val df = synth(10000).filter(col("doc_id") >= 7500)
    val scan = scanOf(df)
    assert(scan.inputRDD.getNumPartitions == 2,
      s"expected 2 surviving splits:\n${df.queryExecution.executedPlan}")
    assert(scan.scan.description().contains("range=[7500,10000)"),
      scan.scan.description())
    assert(df.count() == 2500)
    val both = synth(10000).filter(col("doc_id") >= 7500 && col("doc_id") < 7600)
    assert(scanOf(both).inputRDD.getNumPartitions == 1)
    assert(both.count() == 100)
  }

  test("x08 equality pushdown plans a single split") {
    val df = synth(10000).filter(col("doc_id") === 4242)
    assert(scanOf(df).inputRDD.getNumPartitions == 1)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(4242L))
  }

  test("x08 prunes generated columns (text synthesis skipped when unused)") {
    val df = synth(1000).select("doc_id", "lang")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("cols=[doc_id,lang]"), desc)
    // the pruned read must return the same values the full read would
    val pruned = df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val full = synth(1000).collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._1)
    assert(pruned.sameElements(full))
    // and the pruned reader itself must work WITHOUT the text columns:
    // drive it directly with a doc_id-only projection — a regression
    // that synthesizes rows off the full schema would emit 5 fields
    val rdr = new graft.sources.v2.SynthReader(0, 3, 24, Array("doc_id"))
    assert(rdr.next() && rdr.get().numFields == 1)
  }

  test("x08 rows are deterministic across runs and pushdown shapes") {
    // the same doc ids must carry identical payloads whether reached by
    // a full scan or through a pruned single-split read
    val full = synth(5000).filter(col("doc_id").between(1200, 1210))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val pruned = synth(5000).filter(col("doc_id") >= 1200 && col("doc_id") <= 1210)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(full.nonEmpty && full.toSeq == pruned.toSeq)
    // n_chars is derived from the SAME synthesized text
    val bad = synth(2000).filter(length(col("text")) =!= col("n_chars"))
    assert(bad.count() == 0)
  }
}
