package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{TopK, TopKPerGroupExec}
import graft.sources.Tables

/** x04 — the custom TopKPerGroup operator (logical node + injected
  * planner Strategy + physical exec). Equality against the stock
  * window formulation, the two-phase partial/final plan shape, and
  * edge cases (small groups, k larger than any group).
  */
class TopKSpec extends SparkSpec {

  private def windowTop3 = {
    val li = Tables.lineitem(spark, sf)
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_partkey").asc)
    li.select("l_orderkey", "l_partkey", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  private def customTop3 = {
    val li = Tables.lineitem(spark, sf)
    TopK.perGroup(
      li.select("l_orderkey", "l_partkey", "l_extendedprice"),
      Seq("l_orderkey"),
      Seq(("l_extendedprice", true), ("l_partkey", false)),
      k = 3, rankName = "rn")
  }

  test("x04 custom top-k-per-group equals the window row_number formulation") {
    val got = customTop3.collect().map(_.toSeq).toSet
    val want = windowTop3.collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"diff: only-custom=${(got -- want).take(3)} only-window=${(want -- got).take(3)}")
  }

  test("x04 plans partial -> exchange -> final (two-phase, no Window/Sort of the full input)") {
    val df = customTop3
    df.collect() // AQE finalizes the executed plan only after an action
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"), s"no map-side partial:\n$p")
    assert(p.contains("TopKPerGroupFinal"), s"no final:\n$p")
    assert(!p.contains("Window"), s"fell back to WindowExec:\n$p")
    // the exchange must sit between partial and final: partial appears
    // BELOW (after, in top-down print) the shuffle, final above it
    val lines = p.linesIterator.toIndexedSeq
    val iFinal = lines.indexWhere(_.contains("TopKPerGroupFinal"))
    val iEx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val iPartial = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    assert(iFinal < iEx && iEx < iPartial,
      s"partial/exchange/final out of order ($iFinal/$iEx/$iPartial):\n$p")
  }

  test("x04 partial prunes to at most k rows per group per input partition") {
    // 600 rows, one group, k=2, 4 input partitions => the exchange
    // carries at most 8 rows; the final output is exactly the global
    // top 2 with ranks 1 and 2.
    import spark.implicits._
    val df = spark.range(600).repartition(4)
      .select(lit(1).as("g"), col("id"), (col("id") % 7).as("tie"))
    val top = TopK.perGroup(df, Seq("g"), Seq(("tie", true), ("id", true)), 2)
    val rows = top.select("g", "id", "tie", "rn").as[(Int, Long, Long, Int)].collect().sortBy(_._4)
    assert(rows.length == 2, rows.mkString(","))
    // ties desc then id desc: tie=6 max, ids 594, 587
    assert(rows(0) == ((1, 594L, 6L, 1)), rows.mkString(","))
    assert(rows(1) == ((1, 587L, 6L, 2)), rows.mkString(","))
  }

  test("x04 groups smaller than k emit all rows with dense leading ranks") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("g", "v")
    val top = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 5)
    val got = top.as[(Int, Int, Int)].collect().toSet
    assert(got == Set((1, 10, 1), (1, 20, 2), (2, 5, 1)), got.toString)
  }

  test("x04 equals the window formulation on randomized heavily-tied data") {
    // the production shape (d06/d07/d15): mixed directions, a coarse
    // double score full of ties, a unique ascending tiebreak — any
    // divergence between the bounded-heap pruning and row_number
    // ranking shows up here across several k and partitionings
    import spark.implicits._
    val rnd = new scala.util.Random(0x746f706bL) // "topk"
    val data = Seq.tabulate(3000)(i => (rnd.nextInt(20), rnd.nextInt(5).toDouble, i.toLong))
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("u").asc)
    for ((k, parts) <- Seq((1, 2), (3, 7), (7, 32))) {
      val df = data.toDF("g", "v", "u").repartition(parts)
      val got = TopK.perGroup(df, Seq("g"), Seq(("v", true), ("u", false)), k)
        .select("g", "v", "u", "rn").collect().map(_.toSeq).toSet
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("g", "v", "u", "rn").collect().map(_.toSeq).toSet
      assert(got == want,
        s"k=$k parts=$parts only-custom=${(got -- want).take(3)} only-window=${(want -- got).take(3)}")
    }
  }

  test("x04 merges -0.0 and 0.0 group keys like the window formulation") {
    import spark.implicits._
    // raw UnsafeRow bytes differ for the two zeros; without float
    // normalization one logical group would split into two heaps
    val df = Seq((0.0, 1L), (-0.0, 2L), (-0.0, 3L), (0.0, 4L)).toDF("g", "v")
      .repartition(2)
    val got = TopK.perGroup(df, Seq("g"), Seq(("v", false)), 2)
      .select("v", "rn").as[(Long, Int)].collect().toSet
    assert(got == Set((1L, 1), (2L, 2)), s"zeros split into two groups: $got")
  }

  test("x04 exec node count: exactly one partial and one final") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case q: QueryStageExec => p +: allNodes(q.plan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val df = customTop3
    df.collect()
    val execs = allNodes(df.queryExecution.executedPlan).collect {
      case t: TopKPerGroupExec => t.rankAttr.isDefined
    }
    assert(execs.sorted == Seq(false, true), s"got $execs")
  }
}
