package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.sources.Tables

/** §2.C d14 — multimodal column plumbing.
  *
  * Media (image/audio/video) are opaque `binary` columns with typed
  * metadata; the decode/feature-extract step runs per partition over
  * the raw bytes. The container is the synthetic pure-JVM
  * [[graft.sources.MediaContainer GRFT]] format (this environment
  * ships no image/audio codecs), so the decode is a REAL binary parse
  * — magic/version validation, header metadata, length-prefixed frame
  * reassembly, per-frame CRC-32 integrity — end to end, on top of the
  * Spark-side plumbing a 100 TB media pipeline needs: binary columns
  * at the scan, a typed `Dataset` boundary, batched per-partition
  * processing (the shape a JNI/FFmpeg/Pillow worker would slot into,
  * one library init per partition instead of per row), and a
  * relational feature output that joins back on doc_id.
  */
object Multimodal {

  /** Typed media record: id + raw container bytes + mime. */
  case class MediaBlob(doc_id: Long, blob: Array[Byte], mime: String)

  /** Either-shaped decode row: a features row (`ok = true` — header
    * dims read from the container, content digest over the reassembled
    * payload) or a quarantine record (`ok = false`, stable `err_kind` +
    * full `err` detail, feature columns −1). One corrupt blob in a
    * 100 TB ingest becomes one quarantine ROW, never a stage failure. */
  case class MediaDecodeResult(doc_id: Long, ok: Boolean, err_kind: String,
      err: String, n_bytes: Long, checksum: Long, width: Long, height: Long)

  private def md5Head(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Ingest stand-in: packs each doc's payload into a GRFT container
    * (real media arrives packed; the synthetic corpus has to be). The
    * header dims are derived from the payload digest — the synthetic
    * twin of a generator emitting an image of those dimensions — and
    * from here on only the DECODER ever looks at them. Payloads must be
    * non-null — d14 enforces that AT THE SCAN (`text IS NOT NULL`), so
    * a null never reaches the digest/pack derefs here. */
  private def packPartition(rows: Iterator[(Long, Array[Byte])]): Iterator[MediaBlob] = {
    val md = MessageDigest.getInstance("MD5")
    rows.map { case (id, payload) =>
      val h = md5Head(md, payload)
      MediaBlob(id,
        graft.sources.MediaContainer.pack(payload, (h % 640).toInt, (h % 480).toInt),
        "media/x-graft-frames")
    }
  }

  /** REAL decoder over the container bytes — the ingest contract:
    * validates and parses the GRFT layout, reassembles the payload from
    * its CRC-checked frames, reads the dims out of the header, and
    * digests the decoded payload (one digest instance per partition —
    * the real-decoder initialization pattern). TOLERANT: a malformed
    * container becomes a quarantine row carrying the stable failure
    * kind instead of an exception — at 100 TB one flipped bit must cost
    * one row, not the stage (and after task retries, the job). Esop
    * classifies integrity failures as data the same way
    * (`DataSynchronizator.java:40-93`); the strict
    * [[graft.sources.MediaContainer.unpack]] stays the spec-pinned
    * demuxer contract. The optional accumulator is the per-partition
    * corrupt counter an ingest job watches live — standard Spark
    * transformation-accumulator semantics apply (recomputes and task
    * retries over-count, like any metric updated off the action path),
    * so it is a monitoring signal; EXACT corrupt counts come from
    * aggregating the `ok` column ([[quarantineSummary]]). */
  def decodeTolerant(media: Dataset[MediaBlob],
      corrupt: Option[LongAccumulator] = None): Dataset[MediaDecodeResult] =
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { m =>
        graft.sources.MediaContainer.unpackEither(m.blob) match {
          case Right(dec) =>
            MediaDecodeResult(m.doc_id, ok = true, null, null,
              dec.payload.length.toLong, md5Head(md, dec.payload),
              dec.width.toLong, dec.height.toLong)
          case Left(e) =>
            corrupt.foreach(_.add(1L))
            MediaDecodeResult(m.doc_id, ok = false, e.kind, e.getMessage,
              -1L, -1L, -1L, -1L)
        }
      }
    }(Encoders.product[MediaDecodeResult])

  /** Per-kind rollup: count per stable failure kind — the bounded
    * summary an operator alerts on (the kind set is closed; detail
    * strings with offsets/CRCs stay on the per-row quarantine records). */
  def quarantineSummary(decoded: Dataset[MediaDecodeResult]): DataFrame =
    decoded.filter(not(col("ok")))
      .groupBy("err_kind")
      .agg(count(lit(1)).as("n_quarantined"))

  /** INGEST API: quarantine audit over already-packed containers — what
    * a 100 TB pipeline hands you is packed bytes on storage, not text
    * it packed itself (esop audits what is ON DISK,
    * `DataSynchronizator.java:40-93`). Decode tolerantly, roll up the
    * bounded per-kind summary; one shuffle-free decode stage, the only
    * exchange is the closed-kind-set rollup, and the transform carries
    * no damage/fixture logic — it audits whatever the `media` dataset
    * contains (a parquet blob table, an IO round-trip, a stream). */
  def quarantineAudit(media: Dataset[MediaBlob]): DataFrame =
    quarantineSummary(decodeTolerant(media))

  /** Header row from the metadata-only peek; −1 sentinels on a
    * header-level failure (the [[MediaDecodeResult]] convention). */
  case class MediaHeaderRow(doc_id: Long, ok: Boolean, width: Long,
      height: Long, n_frames: Long)

  /** INGEST API: metadata-only sweep over already-packed containers —
    * dims + declared frame count from the fixed 17-byte header via
    * [[graft.sources.MediaContainer.peekHeader]], no frame walk, no
    * CRC, no payload digest (the ffprobe pattern: a 100 TB dims
    * histogram or frame-budget plan costs the SCAN, not the codec).
    * Stateless per-row, streams as-is. */
  def peekDims(media: Dataset[MediaBlob]): Dataset[MediaHeaderRow] =
    media.map { m =>
      graft.sources.MediaContainer.peekHeader(m.blob) match {
        case Right(h) =>
          MediaHeaderRow(m.doc_id, ok = true, h.width.toLong, h.height.toLong,
            h.nFrames.toLong)
        case Left(_) => MediaHeaderRow(m.doc_id, ok = false, -1L, -1L, -1L)
      }
    }(Encoders.product[MediaHeaderRow])

  /** INGEST API: the row-level quarantine WORKLIST over already-packed
    * containers — the re-drive list an operator actually consumes
    * (doc_id to refetch, stable kind to route on, detail with
    * offsets/CRCs for forensics); esop's analogue is the re-download
    * list `DataSynchronizator` builds from hash-mismatched files.
    * Stateless per-row filter of the tolerant decode, so it streams
    * as-is and persists through [[graft.sources.IO.writeParquet]]
    * unchanged (d45 round-trips it). */
  def quarantineWorklist(media: Dataset[MediaBlob]): DataFrame =
    decodeTolerant(media).filter(not(col("ok")))
      .select("doc_id", "err_kind", "err")

  /** Test/demo FIXTURE (not an ingest entry point): pack each doc's
    * payload into a GRFT container, then damage a deterministic
    * doc_id-keyed minority in transit (version flip %50=7 — an
    * unreadable container; dropped blob %50=23 — a lost object). The
    * damage is keyed on doc_id alone so the DuckDB oracle can predict
    * the audit output exactly. Pack → damage is stateless per-row work
    * in the same stage as the downstream decode, and streams as-is —
    * d44/s14 compose it with [[quarantineAudit]] to keep their
    * oracle-gated shape while the audit itself stays fixture-free. */
  def packDamagedFixture(docs: DataFrame): Dataset[MediaBlob] =
    packFixture(docs)
      .map { m =>
        if (m.doc_id % 50 == 7) {
          val b = m.blob.clone(); b(4) = (b(4) + 1).toByte; m.copy(blob = b)
        }
        else if (m.doc_id % 50 == 23) m.copy(blob = null)
        else m
      }(Encoders.product[MediaBlob])

  /** Test/demo FIXTURE (not an ingest entry point): pack each doc's
    * payload into a clean GRFT container — the undamaged twin of
    * [[packDamagedFixture]], standing in for the packed bytes a real
    * pipeline reads off storage. Stateless per-row, streams as-is. */
  def packFixture(docs: DataFrame): Dataset[MediaBlob] =
    textPayloads(docs)
      .mapPartitions(packPartition)(Encoders.product[MediaBlob])

  /** The d47 metadata sweep over ANY documents-shaped frame (batch
    * table or stream — defined once, shared with s15): pack fixture →
    * header peek → ok rows with dims + declared frame count. Stateless
    * per-row with no aggregation at all, so it streams in append mode. */
  def dimsSweep(docs: DataFrame): DataFrame =
    peekDims(packFixture(docs))
      .where(col("ok"))
      .select("doc_id", "width", "height", "n_frames")

  /** Payload projection shared by every pack path: non-null docs only
    * (pushdown-able at the scan, mirrored in the oracles — pack()
    * requires a payload to digest), utf-8 bytes. */
  private def textPayloads(docs: DataFrame): Dataset[(Long, Array[Byte])] =
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))

  /** The clean-ingest feature pipeline (pack → tolerant decode → ok
    * features) shared by d14 and d46, so d46's "output ≡ d14
    * restricted to the damaged ids" contract holds by construction
    * rather than by keeping two copies in sync. */
  private def decodeFeatures(payloads: Dataset[(Long, Array[Byte])]): DataFrame =
    decodeTolerant(payloads.mapPartitions(packPartition)(Encoders.product[MediaBlob]))
      .where(col("ok"))
      .select("doc_id", "n_bytes", "checksum", "width", "height")

  /** One-per-(JVM, sf) path of the PERSISTED worklist — d45 gates the
    * read-back, d46 consumes it; the Scratch layer makes "written
    * once, read by whoever needs it" the shared contract. */
  private def worklistPath(s: SparkSession, dir: String): String =
    graft.sources.Scratch.materialize(s, "quarantine_worklist", dir)(
      quarantineWorklist(packDamagedFixture(Tables.documents(s, dir))))

  /** The d18 frame-sampling transform over ANY documents-shaped frame
    * (batch table or stream — defined once, shared with s12): every
    * 4th frame of an n_frames clip, one row per sampled frame with a
    * timestamp and the stubbed perceptual hash. Pure per-row bounded
    * explode inside codegen — stateless, so it streams as-is. */
  def frameSample(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .withColumn("n_frames",
        least(greatest(expr("len div 50"), lit(1L)), lit(40L)))
      .select(col("doc_id"),
        explode(expr("sequence(CAST(0 AS BIGINT), n_frames - 1, CAST(4 AS BIGINT))")).as("frame_idx"))
      .withColumn("ts_ms", col("frame_idx") * 40)
      .withColumn("phash", graft.functions.hash32(
        concat(col("doc_id").cast("string"), lit("#"), col("frame_idx").cast("string"))))
      .select("doc_id", "frame_idx", "ts_ms", "phash")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Frame sampling over video-shaped media: every 4th frame of an
    // n_frames clip (n_frames derived from blob length — the stand-in
    // for container metadata), one output row per sampled frame with a
    // timestamp and a stubbed perceptual hash. The Spark shape is the
    // real thing a 100 TB video pipeline needs: a BOUNDED explode
    // (≤ 10 rows/clip) inside codegen, per-row hashing, no shuffle —
    // the decode stub (md5) is where an FFmpeg frame grab would slot.
    "d18_frame_sample" -> { (s, dir) =>
      frameSample(Tables.documents(s, dir))
        .orderBy("doc_id", "frame_idx")
    },

    // pack → decode pipelines in ONE stage (both are mapPartitions over
    // the scan, no shuffle between them); the oracle recomputes the
    // same features straight from the payload, so a decoder that
    // misparses any header field, frame boundary or checksum diverges.
    // The decode is the TOLERANT ingest path (strict unpack is the
    // spec-pinned demuxer contract): on the clean corpus every row is
    // ok, so filtering to ok keeps the oracle identical while the query
    // exercises the quarantine machinery end to end. Null payloads are
    // excluded at the scan (pushdown-able IS NOT NULL, mirrored in the
    // oracle) — pack() requires a payload to digest.
    "d14_multimodal" -> { (s, dir) =>
      decodeFeatures(textPayloads(Tables.documents(s, dir)))
        .orderBy("doc_id")
    },

    // Ingest QUARANTINE audit — the d14 pipeline over a corpus where a
    // deterministic minority of containers is damaged in transit:
    // version-byte flip for doc_id % 50 = 7 (an unreadable container),
    // dropped blob for doc_id % 50 = 23 (a lost object). The tolerant
    // decode classifies each failure by stable kind and the output is
    // the bounded per-kind worklist — oracle-predictable because the
    // damage is keyed on doc_id alone. Pack → damage → decode stay one
    // shuffle-free stage; the only exchange is the tiny kind rollup
    // (map-side partial over a closed kind set), so the audit costs one
    // corpus scan at any SF. The audit API takes already-packed
    // containers (Dataset[MediaBlob]); the pack+damage stage here is
    // the oracle-predictable FIXTURE composed in front of it.
    "d44_media_quarantine" -> { (s, dir) =>
      quarantineAudit(packDamagedFixture(Tables.documents(s, dir)))
        .orderBy("err_kind")
    },

    // Row-level quarantine WORKLIST, PERSISTED: the d44 audit's per-row
    // ok=false records (doc_id to refetch, stable kind, full detail) —
    // the re-drive list a 100 TB ingest actually consumes — written to
    // parquet through the IO/Scratch layer once per (JVM, sf) and read
    // BACK from storage, so the gated result is the round-tripped
    // artifact (the worklist outlives the job that built it; esop's
    // re-download list is likewise a persisted plan, not a transient).
    // Deterministic doc_id-keyed damage makes doc_id, kind AND detail
    // DuckDB-predictable (version flip always reads back 2; a dropped
    // blob is always 'no container bytes'). The build pass is one
    // shuffle-free corpus scan at construction; the measured plan is
    // the tiny worklist read (~2% of docs, pruned to 3 columns).
    "d45_quarantine_worklist" -> { (s, dir) =>
      graft.sources.IO.readParquet(s, worklistPath(s, dir)).orderBy("doc_id")
    },

    // RE-DRIVE: the consumer of d45's persisted worklist — the step
    // that closes the quarantine loop (audit → worklist → refetch →
    // clean decode), esop's `DataSynchronizator` re-download applied.
    // The worklist doc_ids are read back from storage and BROADCAST
    // against ONE corpus scan (a re-drive batch is the corrupt
    // minority, operationally bounded — the 100 TB side stays the
    // streamed probe side and never shuffles); the semi-joined docs are
    // re-fetched (stand-in: packed fresh from the pristine payload —
    // transit damage does not recur) and decoded through the SAME
    // tolerant path, emitting the features the original ingest was
    // denied. Output ≡ d14 restricted to the damaged ids, which is
    // exactly what "the loop closes" means — and the spec pins that the
    // re-drive quarantines nothing.
    "d46_quarantine_redrive" -> { (s, dir) =>
      val worklist = graft.sources.IO.readParquet(s, worklistPath(s, dir))
        .select("doc_id")
      decodeFeatures(textPayloads(
          Tables.documents(s, dir)
            .join(broadcast(worklist), Seq("doc_id"), "left_semi")))
        .orderBy("doc_id")
    },

    // Metadata-only media sweep: per-container dims + declared frame
    // count from the 17-byte header — the decode work d14 pays (frame
    // walk, CRC, payload digest) is skipped entirely, which is the
    // whole point of a metadata pass at 100 TB (ffprobe before
    // ffmpeg): plan frame budgets and dims histograms from a
    // header-read whose cost is the scan. Spec pins peek ≡ full decode
    // on every clean container; on the clean corpus every peek is ok,
    // so the ok-filter keeps the oracle exact while exercising the
    // tolerant path.
    "d47_media_dims" -> { (s, dir) =>
      dimsSweep(Tables.documents(s, dir)).orderBy("doc_id")
    },

    // RESIZE planning — the thumbnail stage of an image pipeline as a
    // metadata-only plan (completes the decode / feature-extract /
    // frame-sample / RESIZE quartet): per container, the aspect-
    // preserving target dims under a 128-px long-side budget, the
    // no-op verdict (never upscale), and the output-byte estimate the
    // downstream writer provisions with — all from d47's header peek,
    // no pixel is ever touched at plan time (the resize EXECUTION at
    // 100 TB is embarrassingly parallel per row; this is the plan
    // that sizes it). Thumb math is exact integer floor division
    // (tw·h ≤ 128·h, th = ⌊h·128/w⌋ — bit-stable cross-engine);
    // zero-dim containers are planned invalid (ok=false, zeroed
    // targets) instead of dividing by zero.
    "d93_resize_plan" -> { (s, dir) =>
      dimsSweep(Tables.documents(s, dir))
        .withColumn("valid", col("width") > 0 && col("height") > 0)
        .withColumn("no_op",
          col("valid") && greatest(col("width"), col("height")) <= 128)
        .withColumn("tw", when(!col("valid"), 0L)
          .when(col("no_op"), col("width"))
          .when(col("width") >= col("height"), lit(128L))
          .otherwise(expr("CAST(width * 128 DIV height AS LONG)")))
        .withColumn("th", when(!col("valid"), 0L)
          .when(col("no_op"), col("height"))
          .when(col("width") >= col("height"),
            expr("CAST(height * 128 DIV width AS LONG)"))
          .otherwise(lit(128L)))
        .withColumn("est_bytes", col("tw") * col("th") * lit(3L))
        .select("doc_id", "width", "height", "valid", "no_op",
          "tw", "th", "est_bytes")
        .orderBy("doc_id")
    },

    // Clip-level near-dup via shared frame fingerprints — the video
    // twin of shingle dedup: each clip contributes one fingerprint per
    // fixed-stride frame (50-char windows standing in for decoded
    // frames, hashed like d18's phash), and two clips pair iff they
    // share ≥ 3 fingerprints. The pairing is an EQUI-join on the
    // fingerprint (shuffle-partitioned by hash — the reused-shot
    // minority, never all clip pairs), with df=1 fingerprints pruned
    // exactly first (a frame seen in ONE clip cannot contribute to any
    // pair — same argument as d02's gram pruning), so at 100 TB the
    // join input is the duplicated-content fraction of the corpus.
    "d27_clip_dedup" -> { (s, dir) =>
      val frames = graft.model.Corpus.docs(s, dir)
        .filter(length(col("norm")) >= 50)
        .select(col("doc_id"), col("norm"),
          explode(expr("sequence(1, length(norm) - 49, 50)")).as("i"))
        .select(col("doc_id"),
          graft.functions.hash32(expr("substring(norm, i, 50)")).as("ph"))
        .distinct()
      val shareable = frames.groupBy("ph")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .select("ph")
      val f = frames.join(shareable, Seq("ph"))
      val a = f.select(col("ph"), col("doc_id").as("a_id"))
      val b = f.select(col("ph"), col("doc_id").as("b_id"))
      a.join(b, Seq("ph"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(count(lit(1)).as("n_shared_frames"))
        .filter(col("n_shared_frames") >= 3)
        .orderBy("a_id", "b_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "d18_frame_sample" ->
      """SELECT doc_id, frame_idx, frame_idx * 40 AS ts_ms,
        |  CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(frame_idx AS VARCHAR))), 1, 8)) AS BIGINT) AS phash
        |FROM (
        |  SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_idx
        |  FROM (SELECT doc_id, least(greatest(length(text) // 50, 1), 40) AS n_frames
        |        FROM documents) meta) t
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "d14_multimodal" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS checksum,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 640 AS width,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 480 AS height
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    "d44_media_quarantine" ->
      """SELECT CASE WHEN doc_id % 50 = 7 THEN 'bad_version' ELSE 'null_blob' END AS err_kind,
        |  count(1) AS n_quarantined
        |FROM documents
        |WHERE text IS NOT NULL AND (doc_id % 50 = 7 OR doc_id % 50 = 23)
        |GROUP BY 1 ORDER BY err_kind""".stripMargin,

    // the full err detail is predictable too: the version flip writes
    // 1+1=2, and a dropped blob always classifies as null_blob with a
    // constant message (exception text format: "<kind>: <detail>")
    "d45_quarantine_worklist" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 50 = 7 THEN 'bad_version' ELSE 'null_blob' END AS err_kind,
        |  CASE WHEN doc_id % 50 = 7 THEN 'bad_version: unsupported GRFT version 2'
        |       ELSE 'null_blob: no container bytes' END AS err
        |FROM documents
        |WHERE text IS NOT NULL AND (doc_id % 50 = 7 OR doc_id % 50 = 23)
        |ORDER BY doc_id""".stripMargin,

    // header fields are payload-derived at pack time: dims from the
    // md5 head (like d14), frame count = ceil(bytes / 64)
    "d47_media_dims" ->
      """SELECT doc_id,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 640 AS width,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 480 AS height,
        |  CAST((strlen(text) + 63) // 64 AS BIGINT) AS n_frames
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,

    // the thumb math over the same header-derived dims d47 reads
    "d93_resize_plan" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 640 AS width,
        |    CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 480 AS height
        |  FROM documents WHERE text IS NOT NULL),
        |plan AS (
        |  SELECT doc_id, width, height,
        |    (width > 0 AND height > 0) AS valid,
        |    (width > 0 AND height > 0 AND greatest(width, height) <= 128) AS no_op
        |  FROM dims)
        |SELECT doc_id, width, height, valid, no_op,
        |  CASE WHEN NOT valid THEN 0
        |       WHEN no_op THEN width
        |       WHEN width >= height THEN 128
        |       ELSE width * 128 // height END AS tw,
        |  CASE WHEN NOT valid THEN 0
        |       WHEN no_op THEN height
        |       WHEN width >= height THEN height * 128 // width
        |       ELSE 128 END AS th,
        |  (CASE WHEN NOT valid THEN 0
        |       WHEN no_op THEN width
        |       WHEN width >= height THEN 128
        |       ELSE width * 128 // height END)
        |  * (CASE WHEN NOT valid THEN 0
        |       WHEN no_op THEN height
        |       WHEN width >= height THEN height * 128 // width
        |       ELSE 128 END) * 3 AS est_bytes
        |FROM plan ORDER BY doc_id""".stripMargin,

    // the closed loop: a re-driven doc decodes to exactly the features
    // the clean ingest (d14) would have produced for it
    "d46_quarantine_redrive" ->
      """SELECT doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) AS checksum,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 640 AS width,
        |  CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 480 AS height
        |FROM documents
        |WHERE text IS NOT NULL AND (doc_id % 50 = 7 OR doc_id % 50 = 23)
        |ORDER BY doc_id""".stripMargin,

    "d27_clip_dedup" -> (graft.model.Corpus.docsCte +
      s""", fr AS (
         |  SELECT DISTINCT doc_id, ${graft.model.Corpus.hash32Sql("substr(norm, i, 50)")} AS ph
         |  FROM docs, UNNEST(range(1, length(norm) - 48, 50)) t(i)
         |  WHERE length(norm) >= 50)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(1) AS n_shared_frames
         |FROM fr a JOIN fr b ON a.ph = b.ph AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(1) >= 3 ORDER BY a_id, b_id""".stripMargin)
  )
}
