package graft

import java.nio.file.{Files, Paths}

/** Dev-loop plan dump (test scope, not shipped): write each query's
  * `.explain("formatted")` output to a file — the round's plan
  * artifacts (plans/rN/<query>_{before,after}.txt).
  * Usage: sbt "Test/runMain graft.PlanDump <outDir> <suffix> <query> [query ...]"
  * Writes <outDir>/<query>_<suffix>.txt */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
