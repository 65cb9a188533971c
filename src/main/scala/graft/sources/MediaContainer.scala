package graft.sources

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** The `GRFT` synthetic media container — a deterministic, pure-JVM
  * stand-in for a real image/video container so the multimodal path
  * (d14) executes a REAL decode end-to-end: binary layout, header
  * parse, frame reassembly and per-frame integrity checks are all
  * genuine; only the codec itself (pixels/samples) is synthetic, since
  * this environment ships no media libraries.
  *
  * Layout (all integers big-endian):
  * {{{
  *   magic   : 4 bytes  "GRFT"
  *   version : 1 byte   (1)
  *   width   : int32    — header metadata, like an image header's dims
  *   height  : int32
  *   nFrames : int32
  *   frame × nFrames:
  *     len     : int32          — payload bytes in this frame
  *     payload : len bytes
  *     crc32   : int32          — CRC-32 of this frame's payload
  * }}}
  *
  * The payload is chunked into ≤[[FrameLen]]-byte frames (an empty
  * payload packs zero frames). [[unpack]] rejects wrong magic/version,
  * truncated buffers, corrupted frames (CRC mismatch) and trailing
  * garbage — the failure modes a real demuxer must detect. */
object MediaContainer {

  final val Magic: Array[Byte] = Array('G', 'R', 'F', 'T')
  final val Version: Byte = 1
  final val FrameLen = 64

  /** Decoded container: header metadata + reassembled payload. */
  final case class Decoded(width: Int, height: Int, payload: Array[Byte])

  /** Header metadata alone — what a metadata-only sweep reads. */
  final case class Header(width: Int, height: Int, nFrames: Int)

  /** Strict-decode failure with a STABLE machine-readable `kind` — the
    * classification an ingest pipeline quarantines and groups by
    * (detail strings embed offsets/CRC values and are unbounded; the
    * kind set is closed). Extends IllegalArgumentException so the
    * strict [[unpack]] contract is unchanged. */
  final class MediaFormatException(val kind: String, detail: String)
    extends IllegalArgumentException(s"$kind: $detail")

  private def check(ok: Boolean, kind: String, detail: => String): Unit =
    if (!ok) throw new MediaFormatException(kind, detail)

  def pack(payload: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val nFrames = (payload.length + FrameLen - 1) / FrameLen
    val buf = ByteBuffer.allocate(17 + payload.length + 8 * nFrames)
    buf.put(Magic).put(Version).putInt(width).putInt(height).putInt(nFrames)
    val crc = new CRC32
    var off = 0
    while (off < payload.length) {
      val len = math.min(FrameLen, payload.length - off)
      buf.putInt(len).put(payload, off, len)
      crc.reset()
      crc.update(payload, off, len)
      buf.putInt(crc.getValue.toInt)
      off += len
    }
    buf.array()
  }

  /** Parse and validate the fixed 17-byte header, leaving `buf`
    * positioned at the first frame — the shared prologue of the full
    * decode and the metadata-only peek (one copy of the header
    * contract, identical failure kinds either way). */
  private def parseHeader(blob: Array[Byte], buf: ByteBuffer): Header = {
    check(blob.length >= 17, "truncated", s"GRFT container truncated: ${blob.length} bytes")
    val magic = new Array[Byte](4)
    buf.get(magic)
    check(java.util.Arrays.equals(magic, Magic), "bad_magic",
      s"not a GRFT container: magic ${magic.map("%02x".format(_)).mkString}")
    val version = buf.get()
    check(version == Version, "bad_version", s"unsupported GRFT version $version")
    val width = buf.getInt
    val height = buf.getInt
    val nFrames = buf.getInt
    check(nFrames >= 0, "bad_frame_count", s"negative frame count $nFrames")
    Header(width, height, nFrames)
  }

  def unpack(blob: Array[Byte]): Decoded = {
    val buf = ByteBuffer.wrap(blob)
    val Header(width, height, nFrames) = parseHeader(blob, buf)
    val out = new java.io.ByteArrayOutputStream(blob.length)
    val crc = new CRC32
    var i = 0
    while (i < nFrames) {
      check(buf.remaining >= 4, "frame_truncated", s"frame $i header truncated")
      val len = buf.getInt
      check(len > 0 && len <= FrameLen, "bad_frame_len", s"frame $i has invalid length $len")
      check(buf.remaining >= len + 4, "frame_truncated", s"frame $i body truncated")
      val frame = new Array[Byte](len)
      buf.get(frame)
      crc.reset()
      crc.update(frame)
      val expect = buf.getInt
      check(crc.getValue.toInt == expect, "crc_mismatch",
        s"frame $i corrupt: crc ${crc.getValue.toInt} != $expect")
      out.write(frame, 0, len)
      i += 1
    }
    check(buf.remaining == 0, "trailing_garbage", s"${buf.remaining} bytes of trailing garbage")
    Decoded(width, height, out.toByteArray)
  }

  /** Tolerant decode for INGEST paths: classifies a malformed container
    * as DATA (a stable failure kind + detail) instead of throwing — at
    * 100 TB corrupt blobs are a statistical certainty, and an exception
    * here fails the whole stage (then, after task retries, the job).
    * Esop treats integrity failure the same way: a hash-mismatched file
    * is classified for re-download, not a crash
    * (`DataSynchronizator.java:40-93`). The strict [[unpack]] remains
    * the demuxer contract the wire-format specs pin.
    *
    * Deliberately catches ONLY [[MediaFormatException]]: [[unpack]]
    * bounds-checks every buffer read before performing it, so by
    * construction malformed BYTES can raise nothing else (the totality
    * property test corrupts every byte×bit of a valid container plus
    * arbitrary garbage to prove the checks exhaustive). Any other
    * exception is therefore a decoder CODE defect and must fail the
    * job loudly — a catch-all here would classify a decoder regression
    * as quarantinable data and silently quarantine the corpus. */
  def unpackEither(blob: Array[Byte]): Either[MediaFormatException, Decoded] =
    try {
      check(blob != null, "null_blob", "no container bytes")
      Right(unpack(blob))
    } catch {
      case e: MediaFormatException => Left(e)
    }

  /** Metadata-only decode: the fixed 17-byte header (dims + declared
    * frame count) WITHOUT walking — or CRC-checking — a single frame.
    * The ffprobe/image-header pattern: a 100 TB metadata sweep (dims
    * histograms, frame budgeting, format triage) reads 17 bytes per
    * container instead of reassembling payloads, so its cost is the
    * scan, not the codec. Tolerant like [[unpackEither]], with the
    * same stable kinds for the header-detectable failure classes
    * (frame-level damage is by definition invisible to a peek — the
    * full decode is the integrity check). */
  def peekHeader(blob: Array[Byte]): Either[MediaFormatException, Header] =
    try {
      check(blob != null, "null_blob", "no container bytes")
      Right(parseHeader(blob, ByteBuffer.wrap(blob)))
    } catch {
      case e: MediaFormatException => Left(e)
    }
}
