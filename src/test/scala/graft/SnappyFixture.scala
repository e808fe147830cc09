package graft

/** Test-side SNAPPY COMPRESSOR (greedy hash-table block compressor +
  * xerial stream framing), implemented independently from the same
  * public format description as the product decoder — the fixture
  * side of the round trip. Emits 2-byte-offset copies (tag 10) and
  * literals with extended lengths, splitting long matches into ≤64
  * byte elements per the format.
  */
object SnappyFixture {

  /** One raw snappy block: preamble varint + literal/copy elements. */
  def compressRaw(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 16)
    // preamble: uncompressed length, LE base-128 varint
    var v = src.length
    while ((v & ~0x7f) != 0) { out.write((v & 0x7f) | 0x80); v >>>= 7 }
    out.write(v)
    def emitLiterals(off: Int, len0: Int): Unit = {
      var o = off; var len = len0
      while (len > 0) {
        val n = math.min(len, 0x10000) // one extended element covers 64K
        if (n <= 60) out.write(((n - 1) << 2))
        else if (n <= 256) { out.write(60 << 2); out.write(n - 1) }
        else {
          out.write(61 << 2)
          out.write((n - 1) & 0xff); out.write(((n - 1) >>> 8) & 0xff)
        }
        out.write(src, o, n)
        o += n; len -= n
      }
    }
    def emitCopy(dist: Int, len0: Int): Unit = {
      var len = len0
      while (len > 0) {
        // the format caps tag-10 copies at 64 bytes; leave ≥4 for the
        // next element so every emitted copy is legal (len ≥ 4)
        val n = if (len > 64 && len < 68) len - 4 else math.min(len, 64)
        out.write(((n - 1) << 2) | 2) // tag 10: 2-byte LE offset
        out.write(dist & 0xff); out.write((dist >>> 8) & 0xff)
        len -= n
      }
    }
    def read4(i: Int): Int = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
      ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
    def hash(x: Int): Int = (x * -1640531535) >>> 18
    val table = Array.fill(1 << 14)(-1)
    var pos = 0
    var anchor = 0
    while (pos + 4 <= src.length) {
      val h = hash(read4(pos))
      val cand = table(h)
      table(h) = pos
      if (cand >= 0 && pos - cand <= 65535 && read4(cand) == read4(pos)) {
        var l = 4
        while (pos + l < src.length && src(cand + l) == src(pos + l)) l += 1
        if (pos > anchor) emitLiterals(anchor, pos - anchor)
        emitCopy(pos - cand, l)
        pos += l
        anchor = pos
      } else pos += 1
    }
    if (src.length > anchor) emitLiterals(anchor, src.length - anchor)
    out.toByteArray
  }

  /** The xerial stream framing Kafka clients wrap snappy in:
    * magic + version ints (BE) + repeated [int32 BE length][block].
    */
  def encodeXerial(src: Array[Byte], blockSize: Int = 32 * 1024): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 32)
    out.write(Array(0x82.toByte, 'S'.toByte, 'N'.toByte, 'A'.toByte,
      'P'.toByte, 'P'.toByte, 'Y'.toByte, 0x00.toByte))
    def i32be(n: Int): Unit = { out.write((n >>> 24) & 0xff)
      out.write((n >>> 16) & 0xff); out.write((n >>> 8) & 0xff)
      out.write(n & 0xff) }
    i32be(1); i32be(1) // version, compatible version
    var off = 0
    while (off < src.length) {
      val n = math.min(blockSize, src.length - off)
      val packed = compressRaw(java.util.Arrays.copyOfRange(src, off, off + n))
      i32be(packed.length)
      out.write(packed)
      off += n
    }
    out.toByteArray
  }
}
