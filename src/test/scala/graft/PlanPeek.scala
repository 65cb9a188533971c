package graft

/** Dev-only: print a query's AQE-final executed plan at sf0.001. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      df.collect()
      println(s"==== $n (executed) ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
