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

  def unpack(blob: Array[Byte]): Decoded = {
    require(blob.length >= 17, s"GRFT container truncated: ${blob.length} bytes")
    val buf = ByteBuffer.wrap(blob)
    val magic = new Array[Byte](4)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"not a GRFT container: magic ${magic.map("%02x".format(_)).mkString}")
    val version = buf.get()
    require(version == Version, s"unsupported GRFT version $version")
    val width = buf.getInt
    val height = buf.getInt
    val nFrames = buf.getInt
    require(nFrames >= 0, s"negative frame count $nFrames")
    val out = new java.io.ByteArrayOutputStream(blob.length)
    val crc = new CRC32
    var i = 0
    while (i < nFrames) {
      require(buf.remaining >= 4, s"frame $i header truncated")
      val len = buf.getInt
      require(len > 0 && len <= FrameLen, s"frame $i has invalid length $len")
      require(buf.remaining >= len + 4, s"frame $i body truncated")
      val frame = new Array[Byte](len)
      buf.get(frame)
      crc.reset()
      crc.update(frame)
      val expect = buf.getInt
      require(crc.getValue.toInt == expect,
        s"frame $i corrupt: crc ${crc.getValue.toInt} != $expect")
      out.write(frame, 0, len)
      i += 1
    }
    require(buf.remaining == 0, s"${buf.remaining} bytes of trailing garbage")
    Decoded(width, height, out.toByteArray)
  }
}
