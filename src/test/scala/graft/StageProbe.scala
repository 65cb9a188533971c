package graft

import org.apache.spark.sql.functions._

/** Dev-loop decomposition probe (test scope, not shipped): time the
  * stages of the shared gram-pair core in isolation at sf0.1 —
  * attributes a family's wall time to scan/cache vs join vs aggregate
  * without a full bench. Usage:
  * sbt "Test/runMain graft.StageProbe" */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime; f
      println(f"STAGEPROBE $name ${(System.nanoTime - t0) / 1e9}%.3f")
    }
    import graft.model.Corpus
    def gramStream = Corpus.docs(spark, dir).filter(size(col("ws")) >= 3)
      .select(col("doc_id"), Corpus.gramsArr.as("ga"))
      .select(col("doc_id"), explode(expr(
        "transform(ga, g -> named_struct('gram', g, 'n', CAST(size(ga) AS BIGINT)))")).as("z"))
      .select(col("doc_id"), col("z.n").as("n"), col("z.gram").as("gram"))
    // warm
    gramStream.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      spark.catalog.clearCache()
      t(s"r$round gram_stream_noop")(gramStream.write.format("noop").mode("overwrite").save())
      val cached = gramStream.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"r$round gram_stream_persist_count")(cached.count())
      val a = cached.select(col("gram"), col("doc_id").as("a_id"), col("n").as("na"))
      val b = cached.select(col("gram"), col("doc_id").as("b_id"), col("n").as("nb"))
      def pairs = a.join(b, Seq("gram"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("inter"), min(col("na")).as("na"), min(col("nb")).as("nb"))
      def joinOnly = a.join(b, Seq("gram")).filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
      t(s"r$round join_only_bhj")(joinOnly.write.format("noop").mode("overwrite").save())
      t(s"r$round pair_join_agg_bhj")(pairs.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      t(s"r$round join_only_smj")(joinOnly.write.format("noop").mode("overwrite").save())
      t(s"r$round pair_join_agg_smj")(pairs.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "67108864")
      t(s"r$round pair_join_agg_shj")(pairs.write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
      spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
      cached.unpersist()
    }
    spark.stop()
  }
}
