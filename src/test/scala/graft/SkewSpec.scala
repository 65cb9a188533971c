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

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.QueryStageExec
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ through)
  }

  test("d01-shaped dedup collapses a 95%-mass content hash map-side (partial agg before the exchange)") {
    // the REAL operator shape that carries hot-key risk at 100 TB: the
    // boilerplate page crawled a billion times makes one content hash
    // carry 95% of the stream. d01's skew-safety is STRUCTURAL — the
    // min/count aggregate partial-combines per input partition, so the
    // shuffle carries ~|distinct hashes| × |partitions| rows however
    // skewed the input. Pin it by running d01's exact transform over a
    // synthetic 95%-one-key stream and measuring the exchange's
    // shuffle-records metric.
    val n = 200000L
    // 8 range splits (no repartition — that would add a second
    // exchange and pollute the records metric); 95% of rows share one
    // body, the rest spread over 1000 rare bodies
    val docs = spark.range(0L, n, 1L, 8).selectExpr("id AS doc_id",
      "IF(id % 20 = 0, concat('rare body ', CAST((id div 20) % 1000 AS STRING)), 'the hot boilerplate page') AS norm")
    val out = graft.operators.Dedup.exactDedupOver(docs)
    val rows = out.collect()
    // correctness under skew: the hot hash keeps the min id with 95% mass
    assert(rows.length == 1001)
    val hot = rows.filter(_.getLong(2) == n - n / 20).toSeq
    assert(hot.size == 1 && hot.head.getLong(1) == 1L,
      s"hot-key row wrong: ${hot.mkString(",")}")
    val finalPlan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val shuffles = allNodes(finalPlan).collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty, s"expected a shuffle under the final agg:\n$finalPlan")
    val written = shuffles.flatMap(_.metrics.get("shuffleRecordsWritten"))
      .map(_.value).sum
    // partial agg bound: ≤ |distinct keys| × |input partitions| ≪ n.
    // without map-side combine this would be ~n (190k hot rows through
    // one reducer — the stall this spec exists to forbid)
    assert(written > 0 && written <= 1001L * 8,
      s"map-side combine missing: $written records crossed the exchange (input $n)")
  }

  test("d60-shaped hot-URL keeper join broadcasts (skew-immune), never a hot-key window") {
    // 95% of crawled rows are variants of ONE page (the d60 hot-URL
    // production risk). The keeper comes from the AGGREGATE+JOIN shape:
    // the aggregate partial-combines the hot key map-side, its output
    // is one row per DISTINCT page, and AQE converts the join-back to
    // a BROADCAST at runtime — the skew-IMMUNE plan: every task
    // handles its slice of the hot key map-side, nothing ever funnels
    // one key into one sorter. (A min-over-window formulation would
    // sort 95% of the corpus in one task with no AQE recourse —
    // windows are never skew-split; and an SMJ keeper join would not
    // be either, because OptimizeSkewedJoin only matches plain
    // shuffle-fed joins, not aggregate-fed ones — broadcast is THE
    // mechanism this shape relies on, so the spec pins it.)
    val n = 200000L
    val urls = spark.range(0L, n, 1L, 8).selectExpr("id AS doc_id",
      """IF(id % 20 = 0,
        |   concat('https://site', CAST(id % 1000 AS STRING), '.example.com/p1'),
        |   concat(IF(id % 2 = 0, 'HTTP://', 'https://www.'),
        |          'hot.example.com/index?utm_source=', CAST(id AS STRING)))
        |AS url""".stripMargin)
    val out = graft.operators.TextAnalysis.urlDedupOver(urls)
    val rows = out.collect()
    assert(rows.length == n)
    // keeper law under skew: every hot-page variant resolves to the
    // global min doc_id of the hot page (id=1 is the first non-rare)
    val hotRows = rows.filter(_.getString(2) == "hot.example.com/index")
    assert(hotRows.length == (n - n / 20).toInt)
    assert(hotRows.forall(r => r.getBoolean(3) == (r.getLong(0) == 1L)))
    val finalPlan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    assert(allNodes(finalPlan).collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"keeper join-back must broadcast the bounded distinct-page table:\n$finalPlan")
    // the 95%-mass data side must never be sorted or windowed by key
    import org.apache.spark.sql.execution.window.WindowExec
    assert(allNodes(finalPlan).collect { case w: WindowExec => w }.isEmpty,
      s"d60 shape must not contain a partition window:\n$finalPlan")
    assert(allNodes(finalPlan).collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"the data side must not sort-merge on the hot key:\n$finalPlan")
  }
}
