package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev probe: MATERIALIZED big-table scan count per query — the number
  * of times the executed plan actually reads documents/embeddings off
  * storage (reused exchanges and cached relations count once, at their
  * single materialization). Shared by PlanAuditSpec's §2.C invariant. */
object ScanCount {
  def counts(s: org.apache.spark.sql.SparkSession, name: String, sf: String): Map[String, Int] = {
    s.catalog.clearCache()
    val df = SparkEntry.queries(name)(s, sf)
    df.collect()
    val seenCaches = scala.collection.mutable.Set[Int]()
    val acc = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: ReusedExchangeExec => () // materialized once, counted there
        case m: InMemoryTableScanExec =>
          // a persisted subtree materializes ONCE per cached relation,
          // however many consumers probe it
          if (seenCaches.add(System.identityHashCode(m.relation.cacheBuilder)))
            walk(m.relation.cachedPlan)
        case f: FileSourceScanExec =>
          Seq("documents", "embeddings").foreach { t =>
            if (f.relation.location.rootPaths.exists(_.toString.contains(t)))
              acc(t) += 1
          }
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    acc.toMap
  }
}

object ScanCountProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.filter(_.startsWith("d")).toSeq.sorted
    names.foreach { n =>
      val c = ScanCount.counts(spark, n, sf)
      println(s"SCANCOUNT $n documents=${c.getOrElse("documents", 0)} embeddings=${c.getOrElse("embeddings", 0)}")
    }
    spark.stop()
  }
}
