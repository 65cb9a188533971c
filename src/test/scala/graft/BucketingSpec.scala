package graft

import org.apache.spark.sql.functions._

import graft.sources.IO

/** Bucketed co-located joins: both sides bucketed on the join key →
  * the join runs with zero exchanges (the 100 TB fact⋈fact strategy). */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no shuffle") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    IO.writeBucketed(orders, "graft_orders_b", "o_orderkey", 8)
    IO.writeBucketed(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "graft_lineitem_b", "o_orderkey", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), "o_orderkey")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val finalPlan = p.split("== Initial Plan ==")(0)
      assert(finalPlan.contains("SortMergeJoin"), finalPlan)
      // the ONLY exchange allowed is the post-join groupBy partial→final
      val exchanges = "Exchange hashpartitioning\\(o_orderkey".r
        .findAllIn(finalPlan).length
      assert(exchanges == 0, s"bucketed join still shuffled:\n$finalPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ledger materialized bucketed by object_key makes ref-count windows exchange-free") {
    // the 100 TB deployment shape for §2.B: persist the manifest ONCE,
    // bucketed on object_key — every ref-count/diff operator (b05/b13
    // style windows and joins on the key) then reads pre-partitioned
    // data and plans ZERO exchanges before the window
    val m = graft.model.BackupLedger.manifest(spark, sf)
    IO.writeBucketed(m, "graft_manifest_b", "object_key", 8)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("object_key")
    val refs = spark.table("graft_manifest_b")
      .withColumn("n_refs", count(lit(1)).over(w))
      .filter(col("n_refs") === 1)
    refs.collect()
    val p = refs.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Exchange hashpartitioning(object_key"),
      s"window still shuffled over the bucketed table:\n$finalPlan")
  }
}
