package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DotLong, SqDistLong}
import graft.model.Corpus

/** §2.C d06/d07/d12/d13 — similarity search over embeddings.
  *
  * Exact-arithmetic design: vectors are quantized to an integer grid
  * ([[Corpus.qvecs]]) so dot products, norms and distances are exact
  * longs; cosine = dot / (√na·√nb) then divides identical integers in
  * both engines → bit-identical doubles, deterministic rankings.
  *
  * Scale:
  *   - d06 brute-force top-k is the correctness baseline: one
  *     broadcast of the smaller side, O(n²) pair stream through a
  *     codegen'd zip_with/aggregate dot product, then a bounded
  *     per-vector window. Exists to validate d07, not to run at SF∞.
  *   - d07 is the scale path: 8 sign-random-projection hyperplanes
  *     (deterministic md5-derived components) bucket vectors; the
  *     quadratic comparison happens only inside buckets — the join is
  *     an equi-join on bucket, shuffle-partitioned by bucket, and the
  *     per-bucket pair count is what a 1000-executor cluster divides.
  *   - d12/d13 are per-row / ×8 projections — no cross-vector shuffle.
  */
object Similarity {


  /** 8 SRP hyperplanes × 64 dims, components in [-1000, 1000]. */
  private def planes(s: SparkSession): DataFrame =
    s.range(0, 8).select(col("id").cast("int").as("j"))
      .withColumn("r", expr(
        """transform(sequence(0, 63), i ->
          |  CAST(conv(substr(md5(concat('rp', CAST(j AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS LONG) % 2001 - 1000)""".stripMargin))

  /** 8 centroids × 64 dims, same deterministic family. */
  private def centroids(s: SparkSession): DataFrame =
    s.range(0, 8).select(col("id").cast("int").as("c"))
      .withColumn("cv", expr(
        """transform(sequence(0, 63), i ->
          |  CAST(conv(substr(md5(concat('cent', CAST(c AS STRING), '_', CAST(i AS STRING))), 1, 8), 16, 10) AS LONG) % 2001 - 1000)""".stripMargin))

  private val planesSql: String =
    s"""planes AS (
       |  SELECT j, list_transform(range(0, 64), i ->
       |    ${Corpus.hash32Sql("concat('rp', CAST(j AS VARCHAR), '_', CAST(i AS VARCHAR))")} % 2001 - 1000) AS r
       |  FROM (SELECT unnest(range(0, 8)) AS j)
       |)""".stripMargin

  private val centroidsSql: String =
    s"""cents AS (
       |  SELECT c, list_transform(range(0, 64), i ->
       |    ${Corpus.hash32Sql("concat('cent', CAST(c AS VARCHAR), '_', CAST(i AS VARCHAR))")} % 2001 - 1000) AS cv
       |  FROM (SELECT unnest(range(0, 8)) AS c)
       |)""".stripMargin

  private val duckDot =
    "CAST(list_sum(list_transform(list_zip(%s, %s), p -> p[1] * p[2])) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-5 neighbors per vector (baseline).
    "d06_cosine_topk" -> { (s, dir) =>
      val q = Corpus.qvecs(s, dir)
      val a = q.toDF("a_id", "qa", "na")
      val b = q.toDF("b_id", "qb", "nb")
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
      a.join(broadcast(b), col("a_id") =!= col("b_id"))
        .withColumn("dot", DotLong(col("qa"), col("qb")))
        .withColumn("cos",
          col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("a_id", "b_id", "rn", "cos")
        .orderBy("a_id", "rn")
    },

    // LSH-bucketed ANN: SRP sign buckets, intra-bucket top-3.
    "d07_ann_lsh" -> { (s, dir) =>
      val q = Corpus.qvecs(s, dir)
      val bucketed = q.crossJoin(broadcast(planes(s)))
        .withColumn("d", DotLong(col("q"), col("r")))
        .groupBy("vec_id")
        .agg(sum(expr("CASE WHEN d > 0 THEN shiftleft(CAST(1 AS LONG), j) ELSE CAST(0 AS LONG) END")).as("bucket"))
        .join(q, Seq("vec_id"))
      val a = bucketed.select(col("vec_id").as("a_id"), col("bucket"),
        col("q").as("qa"), col("norm2").as("na"))
      val b = bucketed.select(col("vec_id").as("b_id"), col("bucket"),
        col("q").as("qb"), col("norm2").as("nb"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
      a.join(b, Seq("bucket"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("dot", DotLong(col("qa"), col("qb")))
        .withColumn("cos",
          col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("a_id", "bucket", "b_id", "rn", "cos")
        .orderBy("a_id", "rn")
    },

    // L2 norm + dimension audit per embedding.
    "d12_embed_norm" -> { (s, dir) =>
      Corpus.qvecs(s, dir)
        .select(
          col("vec_id"),
          size(col("q")).cast("long").as("dim"),
          expr("aggregate(q, CAST(0 AS LONG), (acc, x) -> acc + x)").as("sum_q"),
          sqrt(col("norm2").cast("double")).as("l2_norm"))
        .orderBy("vec_id")
    },

    // k-means assignment step against fixed deterministic centroids.
    "d13_knn_centroid" -> { (s, dir) =>
      val q = Corpus.qvecs(s, dir)
      val w = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("c").asc)
      q.crossJoin(broadcast(centroids(s)))
        .withColumn("dist2", SqDistLong(col("q"), col("cv")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c").as("centroid"), col("dist2"))
        .orderBy("vec_id")
    },

    // IVF-style ANN: coarse-quantize to the d13 centroid cells, then
    // search only within the cell — the second scale path (vs d07's
    // LSH): cells are the shuffle key, comparisons stay intra-cell.
    "d15_ann_ivf" -> { (s, dir) =>
      val q = Corpus.qvecs(s, dir)
      val wAssign = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("c").asc)
      val assigned = q.crossJoin(broadcast(centroids(s)))
        .withColumn("dist2", SqDistLong(col("q"), col("cv")))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c").as("cell"), col("q"), col("norm2"))
      val a = assigned.select(col("vec_id").as("a_id"), col("cell"),
        col("q").as("qa"), col("norm2").as("na"))
      val b = assigned.select(col("vec_id").as("b_id"), col("cell"),
        col("q").as("qb"), col("norm2").as("nb"))
      val w = Window.partitionBy("a_id").orderBy(col("cos").desc, col("b_id").asc)
      a.join(b, Seq("cell"))
        .filter(col("a_id") =!= col("b_id"))
        .withColumn("dot", DotLong(col("qa"), col("qb")))
        .withColumn("cos",
          col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("a_id", "cell", "b_id", "rn", "cos")
        .orderBy("a_id", "rn")
    }
  )

  val oracle: Map[String, String] = Map(
    "d06_cosine_topk" -> (Corpus.qtabCte +
      s"""SELECT a_id, b_id, rn, cos FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) DESC,
         |      b.vec_id ASC) AS rn
         |  FROM qtab a JOIN qtab b ON a.vec_id <> b.vec_id) t
         |WHERE rn <= 5 ORDER BY a_id, rn""".stripMargin),

    "d07_ann_lsh" -> (Corpus.qtabCte + ", " + planesSql +
      s""", dots AS (
         |  SELECT q.vec_id, p.j, ${duckDot.format("q.q", "p.r")} AS d
         |  FROM qtab q CROSS JOIN planes p
         |),
         |buckets AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
         |  FROM dots GROUP BY vec_id
         |),
         |bq AS (SELECT b.vec_id, b.bucket, q.q, q.norm2 FROM buckets b JOIN qtab q USING (vec_id))
         |SELECT a_id, bucket, b_id, rn, cos FROM (
         |  SELECT a.vec_id AS a_id, a.bucket AS bucket, b.vec_id AS b_id,
         |    CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) DESC,
         |      b.vec_id ASC) AS rn
         |  FROM bq a JOIN bq b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id) t
         |WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin),

    "d12_embed_norm" -> (Corpus.qtabCte +
      """SELECT vec_id, CAST(len(q) AS BIGINT) AS dim,
        |  CAST(list_sum(q) AS BIGINT) AS sum_q,
        |  sqrt(CAST(norm2 AS DOUBLE)) AS l2_norm
        |FROM qtab ORDER BY vec_id""".stripMargin),

    "d13_knn_centroid" -> (Corpus.qtabCte + ", " + centroidsSql +
      """SELECT vec_id, c AS centroid, dist2 FROM (
        |  SELECT q.vec_id, ce.c,
        |    CAST(list_sum(list_transform(list_zip(q.q, ce.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist2,
        |    ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      CAST(list_sum(list_transform(list_zip(q.q, ce.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
        |      ce.c ASC) AS rn
        |  FROM qtab q CROSS JOIN cents ce) t
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin),

    "d15_ann_ivf" -> (Corpus.qtabCte + ", " + centroidsSql +
      s""", assigned AS (
         |  SELECT vec_id, c AS cell, q, norm2 FROM (
         |    SELECT q.vec_id, ce.c, q.q, q.norm2,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        CAST(list_sum(list_transform(list_zip(q.q, ce.cv), p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) ASC,
         |        ce.c ASC) AS rn
         |    FROM qtab q CROSS JOIN cents ce) t
         |  WHERE rn = 1
         |)
         |SELECT a_id, cell, b_id, rn, cos FROM (
         |  SELECT a.vec_id AS a_id, a.cell AS cell, b.vec_id AS b_id,
         |    CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
         |      CAST(${duckDot.format("a.q", "b.q")} AS DOUBLE)
         |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) DESC,
         |      b.vec_id ASC) AS rn
         |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id <> b.vec_id) t
         |WHERE rn <= 3 ORDER BY a_id, rn""".stripMargin)
  )
}
