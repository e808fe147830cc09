package graft

/** Test-side LZ4 COMPRESSOR (greedy hash-chain block compressor +
  * frame writer with a real xxHash32 header checksum), implemented
  * independently from the same public specs as the product decoder —
  * the fixture side of the round trip, like MiniKafkaBroker's
  * independent CRC recomputation. Frames it emits are fully
  * spec-valid (a reference lz4 tool would accept them); the product
  * decoder must reproduce the exact input bytes.
  */
object Lz4Fixture {

  // ---- xxHash32 (public algorithm; the frame header checksum) ------
  private val P1 = 0x9E3779B1; private val P2 = 0x85EBCA77
  private val P3 = 0xC2B2AE3D; private val P4 = 0x27D4EB2F
  private val P5 = 0x165667B1

  def xxh32(buf: Array[Byte], off: Int, len: Int, seed: Int): Int = {
    def rotl(x: Int, r: Int): Int = (x << r) | (x >>> (32 - r))
    def u32(i: Int): Int = (buf(i) & 0xff) | ((buf(i + 1) & 0xff) << 8) |
      ((buf(i + 2) & 0xff) << 16) | ((buf(i + 3) & 0xff) << 24)
    var i = off
    val end = off + len
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i + 16 <= end) {
          v1 = rotl(v1 + u32(i) * P2, 13) * P1
          v2 = rotl(v2 + u32(i + 4) * P2, 13) * P1
          v3 = rotl(v3 + u32(i + 8) * P2, 13) * P1
          v4 = rotl(v4 + u32(i + 12) * P2, 13) * P1
          i += 16
        }
        rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      } else seed + P5
    h += len
    while (i + 4 <= end) { h = rotl(h + u32(i) * P3, 17) * P4; i += 4 }
    while (i < end) { h = rotl(h + (buf(i) & 0xff) * P5, 11) * P1; i += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h
  }

  // ---- greedy block compressor --------------------------------------
  /** Compress one block (greedy, 4-byte hash table, 64 KB window) —
    * spec-conforming output: last match ends ≥12 bytes before block
    * end, last 5+ bytes are literals.
    */
  def compressBlock(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len / 2 + 16)
    def read4(i: Int): Int = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
      ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
    def hash(v: Int): Int = (v * -1640531535) >>> 18 // 14-bit table
    def emitLen(n0: Int): Unit = {
      var n = n0
      while (n >= 255) { out.write(255); n -= 255 }
      out.write(n)
    }
    def emitSeq(litOff: Int, litLen: Int, matchLen: Int, dist: Int): Unit = {
      val litTok = math.min(litLen, 15)
      val mTok = if (matchLen == 0) 0 else math.min(matchLen - 4, 15)
      out.write((litTok << 4) | mTok)
      if (litTok == 15) emitLen(litLen - 15)
      out.write(src, litOff, litLen)
      if (matchLen > 0) {
        out.write(dist & 0xff); out.write((dist >>> 8) & 0xff)
        if (mTok == 15) emitLen(matchLen - 4 - 15)
      }
    }
    val end = off + len
    val table = Array.fill(1 << 14)(-1)
    var pos = off
    var anchor = off
    // spec: the last match must start at least 12 bytes before end
    while (pos + 12 <= end) {
      val h = hash(read4(pos))
      val cand = table(h)
      table(h) = pos
      if (cand >= off && pos - cand <= 65535 && read4(cand) == read4(pos)) {
        var l = 4
        // spec: the last 5 bytes of a block are always literals
        while (pos + l < end - 5 && src(cand + l) == src(pos + l)) l += 1
        emitSeq(anchor, pos - anchor, l, pos - cand)
        pos += l
        anchor = pos
      } else pos += 1
    }
    emitSeq(anchor, end - anchor, 0, 0) // trailing literals
    out.toByteArray
  }

  /** One spec-valid frame: FLG = v01 + B.Indep, BD = 64 KB max, real
    * xxHash32 header checksum, blocks of ≤64 KB (stored uncompressed
    * when compression does not help), EndMark.
    */
  def encodeFrame(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 32)
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    u32(0x184D2204)
    val flg = 0x60 // version 01, block independence
    val bd = 0x40  // block max 64 KB
    val hdr = Array(flg.toByte, bd.toByte)
    out.write(flg); out.write(bd)
    out.write((xxh32(hdr, 0, 2, 0) >>> 8) & 0xff)
    var off = 0
    while (off < src.length) {
      val n = math.min(64 * 1024, src.length - off)
      val packed = compressBlock(src, off, n)
      if (packed.length < n) { u32(packed.length); out.write(packed) }
      else { u32(n | 0x80000000); out.write(src, off, n) } // stored
      off += n
    }
    u32(0) // EndMark
    out.toByteArray
  }
}
