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

  /** Distinct word-3-gram shingles per doc (docs with ≥3 words).
    * The shingle build is the [[graft.functions.GramShingles]] codegen
    * kernel — the transform+array_distinct HOF it replaces was
    * CodegenFallback, |words| interpreted lambda steps per doc
    * (element order and values are pinned identical in
    * FunctionsSpec). */
  def grams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(GramShingles(col("ws"), 3, distinct = true)).as("gram"))

  /** Per-row distinct word-3-gram ARRAY — the row-local form of
    * [[grams]] (same shingle family, same distinct) for single-pass
    * fused consumers (d43): one scan can feed the MinHash signature
    * AND the contamination probe without ever exploding the gram
    * stream. Empty (never null) below 3 words — the kernel's own
    * short-input behavior, so no IF wrapper is needed. */
  def gramsArr: org.apache.spark.sql.Column =
    GramShingles(col("ws"), 3, distinct = true)

  /** Distinct non-overlapping 8-word tile hashes per doc (docs with
    * ≥8 words), keyed with (lang, source) — the duplicated-SPAN unit
    * shared by d36 (batch boilerplate pricing) and s10 (the streaming
    * boilerplate gate). Defined over any frame with (doc_id, text,
    * lang, source) so batch tables and streams share one definition. */
  def tiles(df: DataFrame): DataFrame =
    normalized(df)
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), col("lang"), col("source"),
        // tile hashing on the TileMd5 codegen kernel — the transform
        // HOF it replaces sliced + concatenated + hashed interpreted
        // per tile (values and order pinned identical in FunctionsSpec)
        explode(array_distinct(TileMd5(col("ws"), 8, 8))).as("tile"))

  /** POSITIONAL non-overlapping 8-word tile hashes per doc (docs with
    * ≥8 words): (doc_id, i, tile) with i the tile's offset in the doc —
    * [[tiles]] without the distinct, keeping order, so consumers can
    * reason about CONTIGUOUS duplicated extents (d90's span runs)
    * instead of set membership alone. */
  def posTiles(df: DataFrame): DataFrame =
    normalized(df)
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"),
        posexplode(TileMd5(col("ws"), 8, 8)).as(Seq("i", "tile")))

  /** CTE suffix after [[docsCte]]: ptiles(doc_id, i, tile) — the
    * DuckDB twin of [[posTiles]]. */
  val posTilesCte: String =
    """, ptiles AS (
      |  SELECT doc_id, i, md5(array_to_string(ws[(i * 8 + 1):(i * 8 + 8)], ' ')) AS tile
      |  FROM docs, UNNEST(range(0, len(ws) // 8)) t(i)
      |  WHERE len(ws) >= 8
      |)""".stripMargin

  /** WINNOWING-selected rolling 8-word tile fingerprints per doc
    * (docs with ≥8 words): (doc_id, pos, tile) where pos is the
    * fingerprint's word offset. Unlike [[tiles]]/[[posTiles]]
    * (non-overlapping stride-8 tiles — zero shared tiles for a
    * verbatim cross-doc passage whose start offsets differ by
    * k ∉ 8ℤ), the selection is POSITION-ROBUST: stride-1 rolling
    * 8-word hashes, and each window of 8 consecutive hash positions
    * keeps its minimum (leftmost on ties — the tie-break compares
    * (hash, offset) and equal hashes inside one window resolve to the
    * same RELATIVE position in any doc carrying the passage, so the
    * selection is content-determined). The winnowing guarantee
    * (Schleimer et al. 2003, the MOSS fingerprinting algorithm): any
    * shared passage of ≥ w + k − 1 = 15 words yields at least one
    * shared selected fingerprint AT ANY OFFSET ALIGNMENT. Docs with
    * fewer than w full windows keep the whole-doc minimum (the i = 0
    * partial window), so every ≥8-word doc is represented.
    *
    * Scale: the stride-1 explode is |words|−7 rows per doc (the word
    * stream), but the per-doc selection window runs BEFORE anything
    * shuffles by fingerprint — expected selected density is
    * 2/(w+1) ≈ 22% of hash positions, so the cross-doc exchange
    * carries ~|words|/4.5 rows per doc, the same order as d36's
    * stride-8 tile stream at 8× the positional coverage. The
    * selection key is one string min over a per-doc ROWS frame — one
    * doc_id exchange shared with any downstream per-doc window. */
  def winnowTiles(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wsel = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 7)
    normalized(df)
      .filter(size(col("ws")) >= 8)
      // stride-1 rolling hashes on the TileMd5 kernel — this is one
      // md5 per WORD position, the hottest interpreted loop the HOF
      // form paid
      .select(col("doc_id"),
        posexplode(TileMd5(col("ws"), 8, 1)).as(Seq("i", "h")))
      // zero-padded offset rides the key so the string min IS the
      // (hash, offset) lexicographic min — leftmost-on-ties for free
      .withColumn("k",
        concat(col("h"), lit("#"), lpad(col("i").cast("string"), 8, "0")))
      .withColumn("selk", min(col("k")).over(wsel))
      .withColumn("cnt", count(lit(1)).over(wsel))
      // full windows only, plus the i = 0 partial window for docs
      // shorter than w + k − 1 words (whole-doc minimum)
      .filter(col("cnt") === 8 || col("i") === 0)
      .select(col("doc_id"),
        expr("CAST(substring(selk, 34, 8) AS INT)").as("pos"),
        substring(col("selk"), 1, 32).as("tile"))
      .distinct()
  }

  /** CTE suffix after [[docsCte]]: wtiles(doc_id, pos, tile) — the
    * DuckDB twin of [[winnowTiles]]. */
  val winnowTilesCte: String =
    """, rolls AS (
      |  SELECT doc_id, i,
      |    md5(array_to_string(ws[(i + 1):(i + 8)], ' '))
      |      || '#' || lpad(CAST(i AS VARCHAR), 8, '0') AS k
      |  FROM docs, UNNEST(range(0, len(ws) - 7)) t(i)
      |  WHERE len(ws) >= 8
      |), winsel AS (
      |  SELECT doc_id, i,
      |    min(k) OVER (PARTITION BY doc_id ORDER BY i
      |                 ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS selk,
      |    count(1) OVER (PARTITION BY doc_id ORDER BY i
      |                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS cnt
      |  FROM rolls
      |), wtiles AS (
      |  SELECT DISTINCT doc_id,
      |    CAST(substr(selk, 34, 8) AS INTEGER) AS pos,
      |    substr(selk, 1, 32) AS tile
      |  FROM winsel WHERE cnt = 8 OR i = 0
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
    * `label` riding the same scan instead of joining it back). norm2
    * rides the DotLong kernel (Σq² ≡ dot(q, q), same exact longs in
    * the same order) — the aggregate HOF it replaces was
    * CodegenFallback, an interpreted 64-step fold per vector row in
    * EVERY query that reads qvecs. */
  def qvecsAll(df: DataFrame): DataFrame =
    df
      .withColumn("q", expr(
        "transform(embedding, e -> coalesce(CAST(round(CAST(e AS DOUBLE) * 1000) AS LONG), CAST(0 AS LONG)))"))
      .withColumn("norm2", DotLong(col("q"), col("q")))
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
    * [[hash32Sql]] the same way (see d61's oracle).
    *
    * UNROLLED array literal, not `transform(sequence(0, 3), …)` (r19):
    * the transform lambda is CodegenFallback, so the 4-cell build ran
    * INTERPRETED once per token occurrence — the hottest row stream
    * d61/s23 own. The unrolled CreateArray/CreateNamedStruct/concat
    * chain is whole-stage-codegen end to end and computes the same 4
    * structs ('cms<i>#' || w is exactly concat('cms', CAST(i AS
    * STRING), '#', w) for literal i). */
  val cmsCellsSql: String =
    (0 until 4).map(i =>
      s"named_struct('i', $i, 'cell', graft_hash32(concat('cms$i#', w)) % 1024)")
      .mkString("array(", ", ", ")")
}
