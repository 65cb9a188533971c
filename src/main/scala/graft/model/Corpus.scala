package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.Tables

/** Shared text/vector corpus derivations for the training-data
  * pipeline operators (SURVEY §2.C).
  *
  * Cross-engine determinism strategy:
  *   - text goes through one normalization ([[graft.functions.normText]])
  *     whose DuckDB twin is [[normSql]];
  *   - embeddings (float) are quantized to integer grids
  *     (`round(x*1000)`) so every dot product / norm / distance is
  *     EXACT integer arithmetic — identical in Spark and DuckDB, no
  *     float summation-order drift. Derived cosines divide the same
  *     exact integers, giving bit-identical doubles;
  *   - all hash families derive from md5 (byte-identical everywhere).
  *
  * Scale: docs/grams are narrow projections over the parquet scan;
  * quantization is per-row (no shuffle). The gram explode multiplies
  * rows by ~|words|, which is the intended shingle fan-out — LSH
  * banding (d04) and SRP bucketing (d07) exist precisely so the
  * all-pairs comparisons never materialize at 100 TB.
  */
object Corpus {

  /** norm + ws (normalized word array) over ANY frame with a `text`
    * column — shared by the batch table loads and the streaming
    * sources (the transform must be definable once and applied to
    * both). */
  def normalized(df: DataFrame): DataFrame =
    df.withColumn("norm", normText(col("text")))
      .withColumn("ws", split(col("norm"), " "))

  /** doc_id, text, norm, ws (normalized word array). */
  def docs(s: SparkSession, dir: String): DataFrame =
    normalized(Tables.documents(s, dir))

  private val gram3Sql =
    "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"

  /** Distinct word-3-gram shingles per doc (docs with ≥3 words). */
  def grams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(gram3Sql))).as("gram"))

  /** Per-row distinct word-3-gram ARRAY — the row-local form of
    * [[grams]] (same shingle family, same distinct) for single-pass
    * fused consumers (d43): one scan can feed the MinHash signature
    * AND the contamination probe without ever exploding the gram
    * stream. Empty (never null) below 3 words. */
  def gramsArr: org.apache.spark.sql.Column = expr(
    s"IF(size(ws) >= 3, array_distinct($gram3Sql), CAST(array() AS ARRAY<STRING>))")

  /** Distinct non-overlapping 8-word tile hashes per doc (docs with
    * ≥8 words), keyed with (lang, source) — the duplicated-SPAN unit
    * shared by d36 (batch boilerplate pricing) and s10 (the streaming
    * boilerplate gate). Defined over any frame with (doc_id, text,
    * lang, source) so batch tables and streams share one definition. */
  def tiles(df: DataFrame): DataFrame =
    normalized(df)
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(ws) div 8 - 1), i -> md5(concat_ws(' ', slice(ws, i * 8 + 1, 8))))"
        ))).as("tile"))

  /** POSITIONAL non-overlapping 8-word tile hashes per doc (docs with
    * ≥8 words): (doc_id, i, tile) with i the tile's offset in the doc —
    * [[tiles]] without the distinct, keeping order, so consumers can
    * reason about CONTIGUOUS duplicated extents (d90's span runs)
    * instead of set membership alone. */
  def posTiles(df: DataFrame): DataFrame =
    normalized(df)
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(ws) div 8 - 1), i -> md5(concat_ws(' ', slice(ws, i * 8 + 1, 8))))"
      )).as(Seq("i", "tile")))

  /** CTE suffix after [[docsCte]]: ptiles(doc_id, i, tile) — the
    * DuckDB twin of [[posTiles]]. */
  val posTilesCte: String =
    """, ptiles AS (
      |  SELECT doc_id, i, md5(array_to_string(ws[(i * 8 + 1):(i * 8 + 8)], ' ')) AS tile
      |  FROM docs, UNNEST(range(0, len(ws) // 8)) t(i)
      |  WHERE len(ws) >= 8
      |)""".stripMargin

  /** Quantized embeddings: vec_id, q (array<long>, round(x*1000)),
    * norm2 (exact Σq², long). The lambda result is coalesced so `q` is
    * typed ArrayType(..., containsNull=false) — the parquet embedding
    * elements are nominally nullable, and without the coalesce every
    * vector kernel downstream would re-emit its per-element null branch
    * (see [[graft.functions.LongVecKernel.mayContainNullElems]]). */
  def qvecs(s: SparkSession, dir: String): DataFrame =
    qvecsOf(Tables.embeddings(s, dir))

  /** Same quantization over ANY frame with (vec_id, embedding) — the
    * streaming twin (s17) applies it to the arriving vector feed. */
  def qvecsOf(df: DataFrame): DataFrame =
    qvecsAll(df).select("vec_id", "q", "norm2")

  /** Quantization PRESERVING every other input column (d74/d75 keep
    * `label` riding the same scan instead of joining it back). */
  def qvecsAll(df: DataFrame): DataFrame =
    df
      .withColumn("q", expr(
        "transform(embedding, e -> coalesce(CAST(round(CAST(e AS DOUBLE) * 1000) AS LONG), CAST(0 AS LONG)))"))
      .withColumn("norm2", expr(
        "aggregate(q, CAST(0 AS LONG), (acc, x) -> acc + x * x)"))
      .drop("embedding")

  // ---- DuckDB twins -------------------------------------------------

  /** DuckDB expression equal to normText(text). */
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** CTE prefix: docs(doc_id, text, lang, source, norm, ws) +
    * grams(doc_id, gram). */
  val docsCte: String =
    s"""WITH docs AS (
       |  SELECT doc_id, text, lang, source, $normSql AS norm,
       |         string_split($normSql, ' ') AS ws
       |  FROM documents
       |),
       |grams AS (
       |  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
       |  FROM docs, UNNEST(range(1, len(ws) - 1)) t(i)
       |  WHERE len(ws) >= 3
       |)
       |""".stripMargin

  /** CTE suffix after [[docsCte]]: tiles(doc_id, lang, source, tile) —
    * the DuckDB twin of [[tiles]]. */
  val tilesCte: String =
    """, tiles AS (
      |  SELECT DISTINCT doc_id, lang, source,
      |    md5(array_to_string(ws[(i * 8 + 1):(i * 8 + 8)], ' ')) AS tile
      |  FROM docs, UNNEST(range(0, len(ws) // 8)) t(i)
      |  WHERE len(ws) >= 8
      |)""".stripMargin

  /** CTE prefix: qtab(vec_id, q, norm2) — quantized embeddings. The
    * COALESCE mirrors [[qvecs]] exactly: a NULL embedding element maps
    * to 0 in BOTH engines (without it DuckDB's list_sum would skip the
    * slot while Spark's kernel adds the 0 contribution). */
  val qtabCte: String =
    """WITH qtab AS (
      |  SELECT vec_id,
      |         list_transform(embedding, e -> CAST(round(CAST(COALESCE(e, 0.0) AS DOUBLE) * 1000) AS BIGINT)) AS q,
      |         CAST(list_sum(list_transform(list_transform(embedding, e -> CAST(round(CAST(COALESCE(e, 0.0) AS DOUBLE) * 1000) AS BIGINT)), x -> x * x)) AS BIGINT) AS norm2
      |  FROM embeddings
      |)
      |""".stripMargin

  /** DuckDB expression for hash32(x) — must match graft.functions.hash32. */
  def hash32Sql(x: String): String =
    s"CAST(concat('0x', substr(md5($x), 1, 8)) AS BIGINT)"

  /** Count-Min cell coordinates of token column `w`: the 4 (row, cell)
    * pairs — shared by d61 (batch) and s23 (streaming) so both sides
    * hash into the SAME sketch geometry. DuckDB twin composes
    * [[hash32Sql]] the same way (see d61's oracle). */
  val cmsCellsSql: String =
    "transform(sequence(0, 3), i -> named_struct(" +
      "'i', i, 'cell', graft_hash32(concat('cms', CAST(i AS STRING), '#', w)) % 1024))"
}
