package graft.sources

/** Snappy decompression, hand-implemented from the PUBLIC format
  * description (google/snappy format_description.txt) plus the xerial
  * stream framing Kafka producers wrap it in
  * (`{0x82,'S','N','A','P','P','Y',0}` + two int32 versions + repeated
  * `[int32 length][snappy block]` — the format of
  * org.xerial.snappy.SnappyOutputStream, which the Kafka clients use
  * for compression.type=snappy). Zero new dependencies, DECODE ONLY —
  * graft's own producer stays uncompressed.
  *
  * Like [[Lz4]], no checksum layer exists to skip here at all: raw
  * snappy carries none, and integrity is guaranteed upstream by the
  * record batch's CRC32C over the compressed bytes.
  */
private[graft] object Snappy {

  final class SnappyError(msg: String) extends IllegalArgumentException(msg)

  /** Decode one RAW snappy block (preamble varint + tagged elements). */
  def decodeRaw(src: Array[Byte], off: Int, len: Int): Array[Byte] =
    try decodeRaw0(src, off, len)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new SnappyError(s"snappy: malformed block (out of bounds: $e)")
    }

  private def decodeRaw0(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    var s = off
    val end = off + len
    // preamble: uncompressed length, little-endian base-128 varint
    var expect = 0L
    var shift = 0
    var b = 0
    do {
      if (s >= end) throw new SnappyError("snappy: truncated preamble")
      b = src(s) & 0xff; s += 1
      expect |= (b & 0x7fL) << shift; shift += 7
    } while ((b & 0x80) != 0)
    if (expect > Int.MaxValue - 8)
      throw new SnappyError(s"snappy: implausible uncompressed length $expect")
    val dst = new Array[Byte](expect.toInt)
    var d = 0
    while (s < end) {
      val tag = src(s) & 0xff; s += 1
      (tag & 0x3) match {
        case 0 => // literal
          var n = (tag >>> 2) + 1
          if (n > 60) {
            val extra = n - 60 // 1..4 little-endian length bytes
            n = 0
            var i = 0
            while (i < extra) { n |= (src(s) & 0xff) << (8 * i); s += 1; i += 1 }
            n += 1
          }
          if (s + n > end) throw new SnappyError("snappy: literal past end")
          System.arraycopy(src, s, dst, d, n); s += n; d += n
        case c => // copy with 1/2/4-byte offset
          val (n, offset) = c match {
            case 1 =>
              val o = ((tag >>> 5) << 8) | (src(s) & 0xff); s += 1
              (((tag >>> 2) & 0x7) + 4, o)
            case 2 =>
              val o = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8); s += 2
              ((tag >>> 2) + 1, o)
            case _ =>
              val o = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8) |
                ((src(s + 2) & 0xff) << 16) | ((src(s + 3) & 0xff) << 24)
              s += 4
              ((tag >>> 2) + 1, o)
          }
          if (offset <= 0) throw new SnappyError("snappy: zero copy offset")
          var m = d - offset
          if (m < 0) throw new SnappyError("snappy: copy before output start")
          var i = 0
          while (i < n) { dst(d) = dst(m); d += 1; m += 1; i += 1 }
      }
    }
    if (d != expect)
      throw new SnappyError(
        s"snappy: length mismatch (preamble $expect, decoded $d)")
    dst
  }

  private val xerialMagic: Array[Byte] =
    Array(0x82.toByte, 'S', 'N', 'A', 'P', 'P', 'Y', 0x00)

  /** Decode what a Kafka producer ships: xerial-framed blocks when the
    * stream magic is present, one raw block otherwise (old clients).
    */
  def decode(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val framed = len >= 16 &&
      (0 until 8).forall(i => src(off + i) == xerialMagic(i))
    if (!framed) decodeRaw(src, off, len)
    else {
      var s = off + 8 + 4 + 4 // magic + version + compatible version
      val end = off + len
      val out = new java.io.ByteArrayOutputStream(len * 3)
      while (s < end) {
        if (s + 4 > end) throw new SnappyError("snappy: truncated frame block")
        val n = ((src(s) & 0xff) << 24) | ((src(s + 1) & 0xff) << 16) |
          ((src(s + 2) & 0xff) << 8) | (src(s + 3) & 0xff) // int32 BE
        s += 4
        if (n < 0 || s + n > end)
          throw new SnappyError(s"snappy: frame block length $n past end")
        val plain = decodeRaw(src, s, n)
        out.write(plain, 0, plain.length)
        s += n
      }
      out.toByteArray
    }
  }
}
