package graft.operators

import graft._

import org.apache.spark.sql.functions._

/** Dev scratch (test scope): time operator pieces in isolation. */
object Scratch18 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"SCRATCH $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warm whole d24 once (JIT/codegen)
    t("d24 warm")(SparkEntry.queries("d24_dup_clusters")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    // pieces
    val lsh = Dedup.lshPairs(spark, dir).select("a_id", "b_id")
    t("lshPairs noop")(lsh.write.format("noop").mode("overwrite").save())
    val cc = t("connectedComponents construct+run")(
      Curation.connectedComponents(spark, lsh))
    t("cc result noop")(cc.write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    t("d24 timed full")(SparkEntry.queries("d24_dup_clusters")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("d95 warm")(SparkEntry.queries("d95_knn_communities")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.catalog.clearCache()
    t("d95 timed")(SparkEntry.queries("d95_knn_communities")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
