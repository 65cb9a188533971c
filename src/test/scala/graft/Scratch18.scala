package graft

import org.apache.spark.sql.functions._

/** Dev scratch (test scope): time the pieces of the r18 gram-pair
  * rewrite in isolation. Not part of any suite. */
object Scratch18 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"SCRATCH $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // warmup: pay session/JIT/codegen baseline on an unrelated job
    t("warmup docs noop") {
      graft.model.Corpus.docs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    t("warmup grams noop") {
      graft.model.Corpus.grams(spark, dir).write.format("noop").mode("overwrite").save()
    }
    // the fixed dg shape (struct-transform explode), no cache
    def dgPlan = graft.model.Corpus.docs(spark, dir).filter(size(col("ws")) >= 3)
      .select(col("doc_id"), graft.model.Corpus.gramsArr.as("ga"))
      .select(col("doc_id"), explode(expr(
        "transform(ga, g -> named_struct('gram', g, 'n', CAST(size(ga) AS BIGINT)))")).as("z"))
      .select(col("doc_id"), col("z.n").as("n"), col("z.gram").as("gram"))
    t("dg noop (no cache)")(dgPlan.write.format("noop").mode("overwrite").save())
    val dg = dgPlan.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("materialize dg (cache)")(dg.write.format("noop").mode("overwrite").save())
    val a = dg.select(col("gram"), col("doc_id").as("a_id"), col("n").as("na"))
    val b = dg.select(col("gram"), col("doc_id").as("b_id"), col("n").as("nb"))
    val pairs = a.join(b, Seq("gram"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("inter"), min(col("na")).as("na"),
        min(col("nb")).as("nb"))
    t("pair join+agg")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
