package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.{KafkaClient, KafkaPoller, KafkaProto, Lz4}
import org.apache.spark.sql.types._

/** The hand-rolled LZ4 decoder against (a) BYTE-LEVEL vectors derived
  * by hand from the public block-format spec — literals-only, match
  * copy, the overlapping-match RLE idiom, 15/255 length extensions —
  * (b) frame-level variants (stored blocks, content size, block
  * checksums, multi-block), (c) round trips through the INDEPENDENT
  * test-side compressor, and (d) the full Kafka path: an
  * lz4-compressed fetch spooled by the poller.
  */
class Lz4Spec extends SparkSpec {

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  private def decodeBlockAll(block: Array[Byte], expectMax: Int): Array[Byte] = {
    val dst = new Array[Byte](expectMax)
    val n = Lz4.decodeBlock(block, 0, block.length, dst, 0)
    java.util.Arrays.copyOf(dst, n)
  }

  test("block: hand-crafted spec vectors decode exactly") {
    // literals only: token 0x50 = 5 literals, no match (final sequence)
    assert(decodeBlockAll(
      Array[Byte](0x50, 'h', 'e', 'l', 'l', 'o'), 16).toSeq ==
      "hello".getBytes(UTF_8).toSeq)
    // one match: 4 literals "abcd", then match offset 4 length 4+0
    // => "abcdabcd", then final 1 literal "x"
    assert(decodeBlockAll(Array[Byte](
      0x40, 'a', 'b', 'c', 'd', 0x04, 0x00, // token(4 lit, 4 match), lits, offset LE
      0x10, 'x'), 16).toSeq ==
      "abcdabcdx".getBytes(UTF_8).toSeq)
    // OVERLAPPING match (the RLE idiom): 1 literal 'a', offset 1,
    // match length 4+11=15 => "a" * 16, then final literal 'b'
    assert(decodeBlockAll(Array[Byte](
      0x1B, 'a', 0x01, 0x00,
      0x10, 'b'), 32).toSeq == ("a" * 16 + "b").getBytes(UTF_8).toSeq)
    // 15/255 extensions: 15+255+3 = 273 literals
    val lits = Array.fill[Byte](273)('z')
    val block = Array[Byte](0xF0.toByte, 0xFF.toByte, 0x03) ++ lits
    assert(decodeBlockAll(block, 512).toSeq == lits.toSeq)
    // extended MATCH length: 4 literals, offset 4, 19+255+1 = 275
    // match bytes => 279 bytes of repeating "wxyz", then 'q'
    val b2 = Array[Byte](0x4F, 'w', 'x', 'y', 'z', 0x04, 0x00,
      0xFF.toByte, 0x01, 0x10, 'q')
    assert(decodeBlockAll(b2, 512).toSeq ==
      (("wxyz" * 70).take(279) + "q").getBytes(UTF_8).toSeq)
  }

  test("block: malformed inputs are loud Lz4Errors, never silent garbage") {
    // zero match offset
    intercept[Lz4.Lz4Error](decodeBlockAll(
      Array[Byte](0x10, 'a', 0x00, 0x00), 16))
    // offset before output start
    intercept[Lz4.Lz4Error](decodeBlockAll(
      Array[Byte](0x10, 'a', 0x05, 0x00), 16))
    // literals running past the block end
    intercept[Lz4.Lz4Error](decodeBlockAll(Array[Byte](0x70, 'a'), 16))
  }

  test("fuzzed and truncated frames fail as Lz4Error — never hang or leak another exception") {
    val good = Lz4.compressFrame(
      ("lz4 fuzz corpus " * 4000).getBytes("UTF-8"))
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 300) {
      val b = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      // lz4 frames skip their checksums under the Kafka CRC contract,
      // so a content-region flip can decode to different bytes — the
      // contract here is the ERROR TYPE, not detection
      try { Lz4.decodeFrame(b, 0, b.length); () }
      catch { case _: Lz4.Lz4Error => () }
    }
    val small = Lz4.compressFrame("hello lz4 world, hello again".getBytes)
    for (n <- 4 until small.length)
      try { Lz4.decodeFrame(small, 0, n); () }
      catch { case _: Lz4.Lz4Error => () }
  }

  test("frame: fixture-encoded frames round-trip (compressible, random, empty-ish)") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog " * 100,
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "x",
      (0 until 5000).map(i => s"row-$i,value-${i % 7}").mkString("\n"))
    texts.foreach { t =>
      val raw = t.getBytes(UTF_8)
      val frame = Lz4Fixture.encodeFrame(raw)
      val got = Lz4.decodeFrame(frame, 0, frame.length)
      assert(got.toSeq == raw.toSeq, s"round trip failed for ${t.take(30)}…")
      // compressible inputs actually compress (the decoder's match
      // path ran, not just stored blocks)
      if (raw.length > 1000) assert(frame.length < raw.length / 2)
    }
    // incompressible bytes fall back to stored blocks and round-trip
    val rnd = Array.tabulate[Byte](70000)(i =>
      (i * 31 + (i >> 3) * 17 + (i >> 7) * 253).toByte)
    val f = Lz4Fixture.encodeFrame(rnd)
    assert(Lz4.decodeFrame(f, 0, f.length).toSeq == rnd.toSeq)
  }

  test("frame: content-size, block-checksum and multi-block variants decode") {
    val raw = ("payload " * 20000).getBytes(UTF_8) // > 64 KB: several blocks
    val base = Lz4Fixture.encodeFrame(raw)
    assert(Lz4.decodeFrame(base, 0, base.length).toSeq == raw.toSeq)
    // hand-build a frame with C.Size + B.Checksum set (stored blocks)
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff) }
    u32(0x184D2204)
    val flg = 0x60 | 0x10 | 0x08 // v01 + B.Indep + B.Checksum + C.Size
    out.write(flg); out.write(0x40)
    val small = "twelve bytes".getBytes(UTF_8)
    u32(small.length); u32(0) // content size (64-bit LE)
    out.write(0) // header checksum (parsed, not verified — CRC upstream)
    u32(small.length | 0x80000000) // stored block
    out.write(small)
    u32(0xDEAD) // block checksum (parsed, not verified)
    u32(0) // EndMark
    val f2 = out.toByteArray
    assert(Lz4.decodeFrame(f2, 0, f2.length).toSeq == small.toSeq)
    // declared content size that does not match is rejected
    val f3 = f2.clone()
    f3(6) = 99 // content size says 99
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(f3, 0, f3.length))
    // an implausible DECLARED content size (>1 GiB / >Int.MaxValue) is
    // an Lz4Error at header parse, not a NegativeArraySizeException
    // from the wrapped toInt at allocation
    val huge = f2.clone()
    huge(6) = 0; huge(7) = 0; huge(8) = 0; huge(9) = 0x80.toByte // 2 GiB
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(huge, 0, huge.length))
    val wrap = f2.clone() // bit 63 set: negative when read as a long
    (6 to 13).foreach(i => wrap(i) = 0); wrap(13) = 0x80.toByte
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(wrap, 0, wrap.length))
    // bad magic, reserved version and truncation are loud
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(Array[Byte](1, 2, 3, 4, 5, 6, 7), 0, 7))
    val badVer = f2.clone(); badVer(4) = 0x20
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(badVer, 0, badVer.length))
    intercept[Lz4.Lz4Error](Lz4.decodeFrame(f2, 0, 10))
  }

  test("kafka: lz4 record batches decode; CRC covers the compressed bytes") {
    val recs = Seq(
      (Some("k1".getBytes(UTF_8)), ("""{"id":1,"pad":"""" + "p" * 200 + "\"}")
        .getBytes(UTF_8), 1000L),
      (None, """{"id":2}""".getBytes(UTF_8), 1500L))
    val batch = KafkaProto.encodeBatchWith(7L, recs, codec = 3,
      Lz4Fixture.encodeFrame)
    val got = KafkaProto.decodeBatches(batch)
    assert(got.map(_.offset) == Seq(7L, 8L))
    assert(got.map(_.timestamp) == Seq(1000L, 1500L))
    assert(new String(got(1).value, UTF_8) == """{"id":2}""")
    // flip one compressed byte: the batch CRC rejects BEFORE the lz4
    // decoder ever runs — integrity is checked upstream
    val corrupt = batch.clone()
    corrupt(corrupt.length - 3) = (corrupt(corrupt.length - 3) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](
      KafkaProto.decodeBatches(corrupt))
    assert(e.getMessage.contains("CRC"))
  }

  test("poller spools lz4-compressed fetches (producer-compressed topics)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("kind", StringType),
      StructField("value", DoubleType)))
    val srv = new MiniKafkaBroker(numPartitions = 1)
    srv.lz4Fetch = true // every fetched batch arrives lz4-compressed
    val dir = java.nio.file.Files.createTempDirectory("graft_kafka_lz4_")
    try {
      val pre = new KafkaClient("127.0.0.1", srv.port)
      pre.partitions("lz")
      pre.produce("lz", 0, Seq(
        (None, """{"id":1,"kind":"a","value":0.5}"""),
        (None, """{"id":2,"kind":"b","value":1.5}""")))
      pre.close()
      val poller = KafkaPoller.start(
        () => new KafkaClient("127.0.0.1", srv.port), "lz", dir.toString,
        startAt = "earliest", pollIntervalMs = 20L)
      try {
        assert(awaitTrue(3000)(poller.recordCount == 2),
          s"records=${poller.recordCount} dead=${poller.isDead}")
        assert(!poller.isDead)
      } finally poller.stop()
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "a", 0.5), (2L, "b", 1.5)))
    } finally srv.stop()
  }
}
