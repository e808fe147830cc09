package graft.sources

/** LZ4 decompression, hand-implemented from the PUBLIC format specs
  * (lz4 Frame format v1.6.x and Block format — the same open wire
  * documents the Kafka protocol implementation works from), with zero
  * new dependencies. DECODE ONLY: graft's Kafka consumer reads
  * producer-compressed topics (`compression.type=lz4` is the most
  * common production setting), while its own producer stays
  * uncompressed — a broker never requires producers to compress.
  *
  * Checksums (xxHash32 over header/blocks/content) are parsed and
  * SKIPPED, not verified: every magic-2 Kafka record batch carries a
  * CRC32C over its records block — the compressed bytes — and
  * [[KafkaProto.decodeBatches]] validates that BEFORE decompression,
  * so a second integrity layer over the same bytes would be
  * redundant. Structural corruption below the CRC (impossible from a
  * well-formed broker) still fails loudly as [[Lz4Error]], which the
  * spool threads route through reconnect-then-terminal like every
  * decode fault.
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
}
