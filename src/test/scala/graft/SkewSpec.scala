package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** SURVEY §5 claims AQE's skew-join splitting covers the 100× scale-up
  * — this pins that the session's AQE configuration actually SPLITS a
  * skewed shuffle join at runtime instead of stalling one reducer.
  * (Thresholds are lowered test-locally because the defaults trigger
  * at 256 MB partitions — the mechanism, not the threshold, is what
  * the engine relies on.) */
class SkewSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the skewed side of a shuffle join at runtime") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4KB") {
      // 95% of the left rows share key 0 → one reducer would sort almost
      // the whole table; AQE must detect the oversized partition and
      // fan it out across several tasks
      val left = spark.range(0, 200000)
        .selectExpr("IF(id % 20 = 0, id % 1000, CAST(0 AS BIGINT)) AS k",
          "CAST(id AS STRING) AS pad")
      val right = spark.range(0, 1000).selectExpr("id AS k", "id AS w")
      val joined = left.join(right, "k")
      // execute THIS dataframe's plan (count() would execute a
      // different tree and leave joined's adaptive plan un-replanned)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // query stages hold their subtree as a member, not a child —
      // plain collect() stops at the stage boundary
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.QueryStageExec
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val through = p match {
          case q: QueryStageExec => allNodes(q.plan)
          case _ => Seq.empty
        }
        p +: (p.children.flatMap(allNodes) ++ through)
      }
      val smj = allNodes(finalPlan).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
      assert(smj.exists(_.isSkewJoin),
        s"AQE did not mark the join as skew-handled:\n$finalPlan")
    }
  }
}
