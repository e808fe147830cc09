package graft.sources

/** LZ4 frame codec, hand-implemented from the PUBLIC format specs
  * (lz4 Frame format v1.6.x and Block format — the same open wire
  * documents the Kafka protocol implementation works from), with zero
  * new dependencies. The consumer side decodes producer-compressed
  * topics (`compression.type=lz4` is the most common production
  * setting); the producer side ([[compressFrame]]) backs the sink's
  * `compression: "lz4"` setting — rdkafka config parity, kafka.rs.
  *
  * DECODE checksums (xxHash32 over header/blocks/content) are parsed
  * and SKIPPED, not verified: every magic-2 Kafka record batch
  * carries a CRC32C over its records block — the compressed bytes —
  * and [[KafkaProto.decodeBatches]] validates that BEFORE
  * decompression, so a second integrity layer over the same bytes
  * would be redundant. Structural corruption below the CRC
  * (impossible from a well-formed broker) still fails loudly as
  * [[Lz4Error]], which the spool threads route through
  * reconnect-then-terminal like every decode fault.
  *
  * ENCODE emits spec-complete frames a THIRD-PARTY decoder accepts:
  * real xxHash32 header checksum, content size, independent blocks,
  * greedy hash-table match finder over the block format, stored
  * blocks when compression would expand. (Our own decoder skips the
  * HC byte; it is computed for interop, and the spec cross-checks it
  * against the test fixture's independent xxHash32.)
  *
  * Both dependent and independent blocks decode: matches index the
  * GLOBAL output buffer, so a block referencing the previous block's
  * output (B.Indep=0, the default of several older Kafka producers)
  * works the same as independent blocks.
  */
private[graft] object Lz4 {

  final class Lz4Error(msg: String) extends IllegalArgumentException(msg)

  /** Decode one LZ4 block from `src[soff, soff+slen)` into `dst`
    * starting at `dpos0`; returns the new output position. Byte-wise
    * match copy keeps overlapping matches (offset < length — the
    * spec's RLE idiom) correct.
    */
  def decodeBlock(src: Array[Byte], soff: Int, slen: Int,
      dst: Array[Byte], dpos0: Int): Int = {
    var s = soff
    val send = soff + slen
    var d = dpos0
    while (s < send) {
      val token = src(s) & 0xff; s += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 0
        do {
          if (s >= send) throw new Lz4Error("lz4: truncated literal length")
          b = src(s) & 0xff; s += 1; litLen += b
        } while (b == 255)
      }
      if (s + litLen > send)
        throw new Lz4Error("lz4: literals run past block end")
      System.arraycopy(src, s, dst, d, litLen)
      s += litLen; d += litLen
      if (s < send) { // the last sequence of a block has no match part
        if (s + 2 > send) throw new Lz4Error("lz4: truncated match offset")
        val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
        s += 2
        if (offset == 0) throw new Lz4Error("lz4: zero match offset")
        var mLen = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var b = 0
          do {
            if (s >= send) throw new Lz4Error("lz4: truncated match length")
            b = src(s) & 0xff; s += 1; mLen += b
          } while (b == 255)
        }
        var m = d - offset
        if (m < 0) throw new Lz4Error("lz4: match offset before output start")
        var i = 0
        while (i < mLen) { dst(d) = dst(m); d += 1; m += 1; i += 1 }
      }
    }
    d
  }

  /** Decode one LZ4 FRAME from `src[off, off+len)` → the uncompressed
    * bytes. Multi-frame input is legal per the spec but never emitted
    * by Kafka producers; decoding stops at the first EndMark.
    */
  def decodeFrame(src: Array[Byte], off: Int, len: Int): Array[Byte] =
    try decodeFrame0(src, off, len)
    catch {
      case e: ArrayIndexOutOfBoundsException =>
        throw new Lz4Error(s"lz4: malformed frame (out of bounds: $e)")
    }

  private def decodeFrame0(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    var s = off
    val end = off + len
    def u32(): Long = {
      if (s + 4 > end) throw new Lz4Error("lz4: truncated frame")
      val v = (src(s) & 0xffL) | ((src(s + 1) & 0xffL) << 8) |
        ((src(s + 2) & 0xffL) << 16) | ((src(s + 3) & 0xffL) << 24)
      s += 4; v
    }
    if (u32() != 0x184D2204L)
      throw new Lz4Error("lz4: bad frame magic")
    if (s + 2 > end) throw new Lz4Error("lz4: truncated frame descriptor")
    val flg = src(s) & 0xff; s += 1
    if (((flg >>> 6) & 0x3) != 1)
      throw new Lz4Error(s"lz4: unsupported frame version ${(flg >>> 6) & 3}")
    val blockChecksum = ((flg >>> 4) & 1) == 1
    val hasContentSize = ((flg >>> 3) & 1) == 1
    val contentChecksum = ((flg >>> 2) & 1) == 1
    val hasDictId = (flg & 1) == 1
    val bd = src(s) & 0xff; s += 1
    val bmaxBytes = ((bd >>> 4) & 0x7) match {
      case 4 => 64 * 1024
      case 5 => 256 * 1024
      case 6 => 1024 * 1024
      case 7 => 4 * 1024 * 1024
      case o => throw new Lz4Error(s"lz4: reserved block max size code $o")
    }
    val contentSize: Long =
      if (hasContentSize) {
        val lo = u32(); val hi = u32()
        val cs = lo | (hi << 32)
        // sanity-cap the DECLARED size before allocating: a corrupt or
        // hostile header claiming >1 GiB (Kafka fetches cap responses
        // at 64 MiB compressed) must raise Lz4Error, not a wrapped
        // NegativeArraySizeException from contentSize.toInt
        if (cs < 0L || cs > (1L << 30))
          throw new Lz4Error(s"lz4: implausible declared content size $cs")
        cs
      } else -1L
    if (hasDictId) s += 4
    s += 1 // header checksum byte — CRC32C upstream covers integrity
    var dst = new Array[Byte](
      if (contentSize >= 0) contentSize.toInt
      else math.max(bmaxBytes, len * 4))
    var d = 0
    var done = false
    while (!done) {
      val head = u32()
      if (head == 0L) done = true // EndMark
      else {
        val stored = (head & 0x80000000L) != 0L
        val size = (head & 0x7fffffffL).toInt
        if (s + size > end) throw new Lz4Error("lz4: block runs past frame")
        // capacity for the worst case of this block
        val needed = d + (if (stored) size else bmaxBytes)
        if (needed > dst.length)
          dst = java.util.Arrays.copyOf(dst,
            math.max(needed, dst.length * 2))
        if (stored) {
          System.arraycopy(src, s, dst, d, size); d += size
        } else d = decodeBlock(src, s, size, dst, d)
        s += size
        if (blockChecksum) s += 4 // parsed, not verified
      }
    }
    if (contentChecksum) s += 4 // parsed, not verified
    if (contentSize >= 0 && d != contentSize)
      throw new Lz4Error(
        s"lz4: content size mismatch (header $contentSize, got $d)")
    java.util.Arrays.copyOf(dst, d)
  }

  // ----------------------------------------------------------- encode

  /** xxHash32 (public reference algorithm) — only the frame header
    * checksum byte needs it on the encode side; a third-party decoder
    * verifies that byte, so it must be the real hash.
    */
  private[graft] def xxh32(buf: Array[Byte], off: Int, len: Int,
      seed: Int): Int = {
    val P1 = -1640531535; val P2 = -2048144777; val P3 = -1028477379
    val P4 = 668265263; val P5 = 374761393
    def rotl(x: Int, r: Int) = Integer.rotateLeft(x, r)
    def u32(i: Int): Int =
      (buf(i) & 0xff) | ((buf(i + 1) & 0xff) << 8) |
        ((buf(i + 2) & 0xff) << 16) | ((buf(i + 3) & 0xff) << 24)
    var i = off
    val end = off + len
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i <= end - 16) {
          v1 = rotl(v1 + u32(i) * P2, 13) * P1
          v2 = rotl(v2 + u32(i + 4) * P2, 13) * P1
          v3 = rotl(v3 + u32(i + 8) * P2, 13) * P1
          v4 = rotl(v4 + u32(i + 12) * P2, 13) * P1
          i += 16
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (i <= end - 4) { h = rotl(h + u32(i) * P3, 17) * P4; i += 4 }
    while (i < end) { h = rotl(h + (buf(i) & 0xff) * P5, 11) * P1; i += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  /** Greedy LZ4 block compression (hash-table match finder, 64 KiB
    * offset window). Returns None when the compressed form would not
    * be smaller — the caller emits a stored block instead, as the
    * frame format intends.
    */
  private[graft] def compressBlock(src: Array[Byte], soff: Int,
      slen: Int): Option[Array[Byte]] = {
    if (slen < 13) return None // MFLIMIT: tiny inputs stay literal
    val out = new java.io.ByteArrayOutputStream(slen)
    def u32(i: Int): Int =
      (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
    val table = new Array[Int](1 << 16)
    java.util.Arrays.fill(table, -1)
    def hash(v: Int): Int = ((v * -1640531535) >>> 16) & 0xffff
    val end = soff + slen
    val mfLimit = end - 12   // spec: last match starts >= 12 bytes from end
    val matchLimit = end - 5 // spec: last 5 bytes are literals
    var s = soff
    var anchor = soff
    def writeLen(base: Int): Unit = { // 15/255-extension byte runs
      var n = base
      while (n >= 255) { out.write(255); n -= 255 }
      out.write(n)
    }
    def emit(matchPos: Int, matchLen: Int): Unit = {
      val litLen = s - anchor
      val token =
        (math.min(litLen, 15) << 4) | math.min(matchLen - 4, 15)
      out.write(token)
      if (litLen >= 15) writeLen(litLen - 15)
      out.write(src, anchor, litLen)
      val offset = s - matchPos
      out.write(offset & 0xff); out.write((offset >>> 8) & 0xff)
      if (matchLen - 4 >= 15) writeLen(matchLen - 4 - 15)
    }
    while (s < mfLimit) {
      val v = u32(s)
      val h = hash(v)
      val cand = table(h)
      table(h) = s
      if (cand >= soff && s - cand <= 65535 && u32(cand) == v) {
        var m = 4
        while (s + m < matchLimit && src(cand + m) == src(s + m)) m += 1
        emit(cand, m)
        s += m
        anchor = s
      } else s += 1
    }
    // final literals (always >= 5 by construction)
    val litLen = end - anchor
    out.write(math.min(litLen, 15) << 4)
    if (litLen >= 15) writeLen(litLen - 15)
    out.write(src, anchor, litLen)
    val res = out.toByteArray
    if (res.length < slen) Some(res) else None
  }

  private val blockMax = 4 * 1024 * 1024 // BD code 7

  /** Encode one LZ4 FRAME (v1, independent 4 MiB blocks, content
    * size present, real header checksum, no block/content checksums
    * — both optional per spec; Kafka's CRC32C covers integrity).
    */
  def compressFrame(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    def w32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    w32(0x184D2204)
    // FLG: version 01, B.Indep, content size; BD: 4 MiB blocks
    val descriptor = Array[Byte](
      ((1 << 6) | (1 << 5) | (1 << 3)).toByte, (7 << 4).toByte,
      (data.length & 0xff).toByte, ((data.length >>> 8) & 0xff).toByte,
      ((data.length >>> 16) & 0xff).toByte,
      ((data.length >>> 24) & 0xff).toByte, 0, 0, 0, 0)
    out.write(descriptor, 0, descriptor.length)
    out.write((xxh32(descriptor, 0, descriptor.length, 0) >>> 8) & 0xff)
    var off = 0
    while (off < data.length) {
      val n = math.min(blockMax, data.length - off)
      compressBlock(data, off, n) match {
        case Some(c) => w32(c.length); out.write(c, 0, c.length)
        case None    => w32(n | 0x80000000); out.write(data, off, n)
      }
      off += n
    }
    w32(0) // EndMark
    out.toByteArray
  }
}
