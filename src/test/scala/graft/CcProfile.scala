package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing of the d95 pipeline at a given SF. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    // warm artifacts + JVM
    graft.operators.Similarity.queries("d50_ann_index_probe")(spark, sf).collect()
    val cents = graft.sources.IO.readParquet(spark,
      graft.operators.Similarity.annIndexCents(spark, sf))
    val post = graft.sources.IO.readParquet(spark,
      graft.operators.Similarity.annIndexPostings(spark, sf))
    for (i <- 1 to 2) {
      spark.catalog.clearCache()
      val edges = t(s"probe$i") {
        val e = graft.operators.Similarity.queries("d50_ann_index_probe")(spark, sf)
          .select(col("a_id"), col("b_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        e.count(); e
      }
      val mutual = t(s"mutual$i") {
        val m = edges
          .join(edges.select(col("b_id").as("a_id"), col("a_id").as("b_id")),
            Seq("a_id", "b_id"), "left_semi")
          .filter(col("a_id") < col("b_id"))
        m.count(); m
      }
      val labels = t(s"cc$i") {
        graft.operators.Curation.connectedComponents(spark, mutual)
      }
      t(s"sizes$i") {
        labels
          .join(labels.groupBy("lbl").agg(count(lit(1)).as("cluster_size")), Seq("lbl"))
          .select(col("id"), col("lbl"), col("cluster_size"))
          .orderBy("id").collect()
      }
    }
    spark.stop()
  }
}
