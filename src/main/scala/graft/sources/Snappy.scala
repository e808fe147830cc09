package graft.sources

/** Snappy codec, hand-implemented from the PUBLIC format description
  * (google/snappy format_description.txt) plus the xerial stream
  * framing Kafka producers wrap it in
  * (`{0x82,'S','N','A','P','P','Y',0}` + two int32 versions + repeated
  * `[int32 length][snappy block]` — the format of
  * org.xerial.snappy.SnappyOutputStream, which the Kafka clients use
  * for compression.type=snappy). Zero new dependencies. The decode
  * side reads producer-compressed topics; the encode side
  * ([[compress]]) backs the sink's `compression: "snappy"` setting
  * with a greedy match finder emitting literal and copy-2 elements —
  * a strict subset of the format every third-party decoder accepts.
  *
  * Like [[Lz4]], no checksum layer exists here at all: raw snappy
  * carries none, and integrity is guaranteed upstream by the record
  * batch's CRC32C over the compressed bytes.
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

  // ----------------------------------------------------------- encode

  /** Compress one RAW snappy block: varint preamble + greedy
    * literal/copy-2 elements (hash-table match finder, 64 KiB offset
    * window, copies capped at 64 bytes and re-emitted for longer
    * matches — exactly what the format's copy-2 element allows).
    */
  private[graft] def compressRaw(src: Array[Byte], soff: Int,
      slen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(slen / 2 + 16)
    var n = slen // preamble: uncompressed length varint
    while ((n & ~0x7f) != 0) { out.write((n & 0x7f) | 0x80); n >>>= 7 }
    out.write(n)
    def u32(i: Int): Int =
      (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
    def literal(from: Int, until: Int): Unit = {
      var a = from
      while (a < until) {
        val len = math.min(until - a, 65536) // 2-ext-byte ceiling
        if (len <= 60) out.write((len - 1) << 2)
        else if (len <= 256) { out.write(60 << 2); out.write(len - 1) }
        else {
          out.write(61 << 2)
          out.write((len - 1) & 0xff); out.write(((len - 1) >>> 8) & 0xff)
        }
        out.write(src, a, len)
        a += len
      }
    }
    def copy2(offset: Int, mlen: Int): Unit = {
      var left = mlen
      while (left > 0) {
        // spec minimum copy length is 4; never strand a 1..3 tail
        val take =
          if (left > 64) { if (left - 64 >= 4) 64 else left - 4 }
          else left
        out.write(((take - 1) << 2) | 2)
        out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
        left -= take
      }
    }
    val table = new Array[Int](1 << 16)
    java.util.Arrays.fill(table, -1)
    def hash(v: Int): Int = ((v * -1640531535) >>> 16) & 0xffff
    val end = soff + slen
    var s = soff
    var anchor = soff
    while (s + 4 <= end) {
      val v = u32(s)
      val h = hash(v)
      val cand = table(h)
      table(h) = s
      if (cand >= soff && s - cand <= 65535 && u32(cand) == v) {
        var m = 4
        while (s + m < end && src(cand + m) == src(s + m)) m += 1
        literal(anchor, s)
        copy2(s - cand, m)
        s += m
        anchor = s
      } else s += 1
    }
    literal(anchor, end)
    out.toByteArray
  }

  /** Compress what a Kafka producer ships: xerial stream framing
    * around raw blocks of <= 32 KiB (SnappyOutputStream's default
    * block size — kept so real consumers see familiar frame shapes).
    */
  def compress(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 32)
    out.write(xerialMagic, 0, 8)
    def i32be(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    i32be(1); i32be(1) // version, minimum compatible version
    var off = 0
    val block = 32 * 1024
    while (off < data.length) {
      val nb = math.min(block, data.length - off)
      val c = compressRaw(data, off, nb)
      i32be(c.length)
      out.write(c, 0, c.length)
      off += nb
    }
    out.toByteArray
  }
}
