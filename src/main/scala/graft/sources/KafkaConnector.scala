package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL Kafka transport for the connector surface (reference
  * connector/kafka.rs:19-56 config: brokers, topic, group_id,
  * transactional_id; its full impl is feature-gated behind rdkafka —
  * source consumes JSON payloads, kafka.rs:256-296; sink produces
  * each event's JSON with acks=all, kafka.rs:344-353). graft
  * implements the actual Kafka wire protocol
  * (kafka.apache.org/protocol) with zero new dependencies, loopback-
  * tested like MQTT/NATS/Redis/Kinesis.
  *
  * Protocol versions are the post-KIP-896 floor — the OLDEST versions
  * a Kafka 4.x broker still accepts, which are also the newest
  * non-flexible (pre-tagged-fields) encodings, so one codec covers
  * brokers from 2.1 through current:
  *   - ApiVersions v0, Metadata v4, Produce v3, Fetch v4,
  *     ListOffsets v1, SaslHandshake v1 + SaslAuthenticate v0 (PLAIN)
  *   - records travel as magic-2 record batches (zigzag-varint record
  *     framing, CRC32C over the batch tail) — the only message format
  *     modern brokers retain; the loopback fixture RECOMPUTES the
  *     CRC and rejects mismatches, so the spec round trip is a real
  *     integrity check, not an echo.
  *
  * Compression: the consumer decodes the FULL rdkafka codec matrix —
  * UNCOMPRESSED, GZIP, SNAPPY, LZ4 and ZSTD batches (attributes&7 ==
  * 0|1|2|3|4 — gzip via java.util.zip, lz4/snappy/zstd via the
  * hand-rolled [[Lz4]]/[[Snappy]]/[[Zstd]] decoders built from the
  * public wire specs; zero new dependencies, and the batch CRC32C
  * covers the compressed bytes so integrity is verified BEFORE
  * decompression — zstd's own content checksum, which covers the
  * DECODED bytes the CRC cannot see, is additionally verified). The
  * producer matches the consumer matrix: `compression:
  * none|gzip|lz4|snappy|zstd` on the connector compresses each
  * produced batch (rdkafka `compression.type` parity, kafka.rs:19-56),
  * and the test fixtures keep their OWN independent codec
  * implementations (real-zstd CLI vectors for zstd) so round trips
  * still cross two implementations.
  *
  * Distribution shape matches the other brokered connectors: ONE
  * driver-side poller (the reference's single consumer loop,
  * kafka.rs:249-311) fetches every partition and spools JSON values
  * as atomic NDJSON for Spark's file source; the sink produces
  * executor-side, one connection per Spark partition, in bounded
  * chunks with acks=-1 — each Produce response is the broker's
  * durability acknowledgment, so a Spark task succeeds only once its
  * records are acked (at-least-once, like every task-retry sink; the
  * reference's transactional exactly-once rides on broker-side
  * transaction coordination that its own default path doesn't use
  * either). Spool ceiling, measured on loopback
  * (ConnectorThroughputSpec): ~140k rec/s through one poller thread
  * (fetch is batch-framed, so the spool amortizes far better than
  * the push protocols) — beyond it, bind spark-sql-kafka for
  * executor-parallel ingestion. Multi-broker clusters are first-class
  * since r12: [[KafkaRouter]] routes every partition operation to its
  * leader from the Metadata broker list, refreshing the view when a
  * broker answers NOT_LEADER_OR_FOLLOWER (KafkaClusterSpec proves it
  * against a two-node loopback cluster).
  */
private[graft] object KafkaProto {

  // ---- primitive writer ---------------------------------------------
  final class Wire {
    private val buf = new java.io.ByteArrayOutputStream(256)
    def i8(v: Int): Wire = { buf.write(v & 0xff); this }
    def i16(v: Int): Wire = { buf.write((v >> 8) & 0xff); buf.write(v & 0xff); this }
    def i32(v: Int): Wire = { i16(v >> 16); i16(v); this }
    def i64(v: Long): Wire = { i32((v >> 32).toInt); i32(v.toInt); this }
    def bool(v: Boolean): Wire = i8(if (v) 1 else 0)
    def str(s: String): Wire = { val b = s.getBytes(UTF_8); i16(b.length); raw(b) }
    def nullableStr(s: Option[String]): Wire =
      s.fold(i16(-1))(str)
    def bytes(b: Array[Byte]): Wire = { i32(b.length); raw(b) }
    def nullableBytes(b: Option[Array[Byte]]): Wire =
      b.fold(i32(-1))(bytes)
    def raw(b: Array[Byte]): Wire = { buf.write(b, 0, b.length); this }
    /** zigzag varint (record framing) */
    def vInt(v: Int): Wire = vLong(v.toLong)
    def vLong(v: Long): Wire = {
      var z = (v << 1) ^ (v >> 63)
      while ((z & ~0x7fL) != 0) { buf.write(((z & 0x7f) | 0x80).toInt); z >>>= 7 }
      buf.write(z.toInt)
      this
    }
    def array[T](xs: Seq[T])(f: (Wire, T) => Unit): Wire = {
      i32(xs.length); xs.foreach(x => f(this, x)); this
    }
    def result(): Array[Byte] = buf.toByteArray
    def size: Int = buf.size
  }

  // ---- primitive reader ---------------------------------------------
  final class Cursor(val bb: ByteBuffer) {
    def i8: Int = bb.get().toInt
    def i16: Int = bb.getShort().toInt
    def i32: Int = bb.getInt()
    def i64: Long = bb.getLong()
    def bool: Boolean = bb.get() != 0
    def str: String = {
      val n = i16
      val b = new Array[Byte](n); bb.get(b); new String(b, UTF_8)
    }
    def nullableStr: Option[String] = {
      val n = i16
      if (n < 0) None
      else { val b = new Array[Byte](n); bb.get(b); Some(new String(b, UTF_8)) }
    }
    def bytes(n: Int): Array[Byte] = { val b = new Array[Byte](n); bb.get(b); b }
    def nullableBytes: Option[Array[Byte]] = {
      val n = i32
      if (n < 0) None else Some(bytes(n))
    }
    def vLong: Long = {
      var z = 0L; var shift = 0; var b = 0
      do {
        b = bb.get() & 0xff
        z |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      (z >>> 1) ^ -(z & 1)
    }
    def vInt: Int = vLong.toInt
    def remaining: Int = bb.remaining()
  }

  def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** One decoded record. */
  final case class Record(offset: Long, timestamp: Long,
      key: Option[Array[Byte]], value: Array[Byte])

  /** Fetch hit error 1: the requested offset fell off the log
    * (truncation/retention). Typed so the poller can re-resolve the
    * partition offset per its startAt policy (the auto.offset.reset
    * behavior) instead of treating it as connection loss.
    */
  final class OffsetOutOfRange(msg: String) extends java.io.IOException(msg)

  /** Error 6: this broker no longer (or never) leads the partition.
    * Typed so [[KafkaRouter]] can refresh metadata and re-route to
    * the new leader instead of treating it as connection loss.
    */
  final class NotLeader(msg: String) extends java.io.IOException(msg)

  /** Encode records as ONE magic-2 record batch (uncompressed).
    * Layout per the spec: baseOffset, batchLength (bytes after the
    * field), partitionLeaderEpoch, magic=2, crc (CRC32C over
    * attributes..end), attributes, lastOffsetDelta, base/maxTimestamp,
    * producerId/Epoch, baseSequence, recordCount, records.
    */
  def encodeBatch(baseOffset: Long,
      records: Seq[(Option[Array[Byte]], Array[Byte], Long)],
      gzip: Boolean = false): Array[Byte] =
    encodeBatch(baseOffset, records, if (gzip) "gzip" else "none")

  /** [[encodeBatch]] with a named codec — the producer counterpart
    * of the consumer's decode matrix (none/gzip/lz4/snappy/zstd).
    */
  def encodeBatch(baseOffset: Long,
      records: Seq[(Option[Array[Byte]], Array[Byte], Long)],
      codecName: String): Array[Byte] = codecName match {
    case "none" | "" =>
      encodeBatchWith(baseOffset, records, codec = 0, identity)
    case "gzip" =>
      encodeBatchWith(baseOffset, records, codec = 1, recBlock => {
        val bos = new java.io.ByteArrayOutputStream(recBlock.length)
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(recBlock); gz.close()
        bos.toByteArray
      })
    case "snappy" =>
      encodeBatchWith(baseOffset, records, codec = 2, Snappy.compress)
    case "lz4" =>
      encodeBatchWith(baseOffset, records, codec = 3, Lz4.compressFrame)
    case "zstd" =>
      encodeBatchWith(baseOffset, records, codec = 4, Zstd.compressFrame)
    case other => throw new IllegalArgumentException(
      s"kafka: unknown compression '$other' (none|gzip|lz4|snappy|zstd)")
  }

  /** [[encodeBatch]] with an arbitrary records-block codec — the
    * fixture plugs its test-side lz4 compressor in here so the
    * consumer's decoder round-trips against an independent encoder.
    */
  def encodeBatchWith(baseOffset: Long,
      records: Seq[(Option[Array[Byte]], Array[Byte], Long)],
      codec: Int,
      compress: Array[Byte] => Array[Byte]): Array[Byte] = {
    require(records.nonEmpty, "kafka: empty batch")
    val baseTs = records.map(_._3).min
    val maxTs = records.map(_._3).max
    val recs = new Wire // the records block (the compressed section)
    records.zipWithIndex.foreach { case ((k, v, ts), i) =>
      val r = new Wire
      r.i8(0)                         // record attributes
        .vLong(ts - baseTs)           // timestampDelta
        .vInt(i)                      // offsetDelta
      k match {
        case Some(kb) => r.vInt(kb.length).raw(kb)
        case None     => r.vInt(-1)
      }
      r.vInt(v.length).raw(v)
      r.vInt(0)                       // headers
      val rb = r.result()
      recs.vInt(rb.length).raw(rb)
    }
    val recBytes = compress(recs.result())
    val body = new Wire // attributes .. records (the CRC'd section)
    body.i16(codec & 0x7)             // attributes bits 0-2: codec
      .i32(records.length - 1)        // lastOffsetDelta
      .i64(baseTs).i64(maxTs)
      .i64(-1L).i16(-1).i32(-1)       // producerId/Epoch, baseSequence
      .i32(records.length)
      .raw(recBytes)
    val tail = body.result()
    val crc = crc32c(tail, 0, tail.length)
    val out = new Wire
    out.i64(baseOffset)
      .i32(4 + 1 + 4 + tail.length)   // batchLength: leaderEpoch+magic+crc+tail
      .i32(-1)                        // partitionLeaderEpoch
      .i8(2)                          // magic
      .i32(crc)
      .raw(tail)
    out.result()
  }

  /** Decode every batch in a record set (a Fetch response may carry
    * several); validates magic and CRC32C, rejects compressed batches.
    */
  def decodeBatches(recordSet: Array[Byte]): Seq[Record] = {
    val out = Seq.newBuilder[Record]
    val bb = ByteBuffer.wrap(recordSet)
    // a partial trailing batch (broker hit maxBytes mid-batch) is legal;
    // stop cleanly when fewer than header bytes remain
    while (bb.remaining() >= 12 + 49) {
      val baseOffset = bb.getLong()
      val batchLength = bb.getInt()
      if (bb.remaining() < batchLength) { bb.position(bb.limit()) }
      else {
        val start = bb.position()
        val c = new Cursor(bb)
        val _leaderEpoch = c.i32
        val magic = c.i8
        require(magic == 2, s"kafka: unsupported message magic $magic")
        val crc = c.i32
        val tailLen = batchLength - 4 - 1 - 4
        val got = crc32c(recordSet, bb.position(), tailLen)
        require(got == crc,
          f"kafka: record batch CRC mismatch (got 0x$got%08x want 0x$crc%08x)")
        val attributes = c.i16
        val codec = attributes & 0x07
        val _lastOffsetDelta = c.i32
        val baseTs = c.i64
        val _maxTs = c.i64
        c.i64; c.i16; c.i32 // producerId, producerEpoch, baseSequence
        val n = c.i32
        // the records block (everything after the batch header) is the
        // compressed section when attributes bits 0-2 name a codec;
        // gzip decodes with java.util.zip, lz4/snappy/zstd with the
        // hand-rolled decoders ([[Lz4]], [[Snappy]], [[Zstd]]) — zero
        // new dependencies, the FULL rdkafka codec matrix. The batch
        // CRC32C above covers the COMPRESSED bytes, so integrity is
        // already checked before decompression (and Zstd verifies its
        // own content checksum over the DECODED bytes).
        val recordsLen = start + batchLength - bb.position()
        val rc: Cursor = codec match {
          case 0 => c
          case 1 =>
            val gz = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(
                recordSet, bb.position(), recordsLen))
            val plain = gz.readAllBytes()
            bb.position(bb.position() + recordsLen)
            new Cursor(ByteBuffer.wrap(plain))
          case 2 =>
            val plain = Snappy.decode(recordSet, bb.position(), recordsLen)
            bb.position(bb.position() + recordsLen)
            new Cursor(ByteBuffer.wrap(plain))
          case 3 =>
            val plain = Lz4.decodeFrame(recordSet, bb.position(), recordsLen)
            bb.position(bb.position() + recordsLen)
            new Cursor(ByteBuffer.wrap(plain))
          case 4 =>
            val plain = Zstd.decode(recordSet, bb.position(), recordsLen)
            bb.position(bb.position() + recordsLen)
            new Cursor(ByteBuffer.wrap(plain))
          case other =>
            throw new IllegalArgumentException(
              s"kafka: codec $other batches not supported — graft " +
                "decodes the full rdkafka matrix: uncompressed, gzip " +
                "(java.util.zip), lz4, snappy and zstd (hand-rolled " +
                "decoders); attribute bits 5-7 name no further codec.")
        }
        var i = 0
        while (i < n) {
          val len = rc.vInt
          val end = rc.bb.position() + len
          rc.i8 // record attributes
          val tsDelta = rc.vLong
          val offDelta = rc.vInt
          val kLen = rc.vInt
          val key = if (kLen < 0) None else Some(rc.bytes(kLen))
          val vLen = rc.vInt
          val value = if (vLen < 0) Array.empty[Byte] else rc.bytes(vLen)
          out += Record(baseOffset + offDelta, baseTs + tsDelta, key, value)
          rc.bb.position(end) // skip headers
          i += 1
        }
        bb.position(start + batchLength)
      }
    }
    out.result()
  }

  // error codes this client surfaces by name
  val errorNames: Map[Int, String] = Map(
    0 -> "NONE", 1 -> "OFFSET_OUT_OF_RANGE", 2 -> "CORRUPT_MESSAGE",
    3 -> "UNKNOWN_TOPIC_OR_PARTITION", 5 -> "LEADER_NOT_AVAILABLE",
    6 -> "NOT_LEADER_OR_FOLLOWER", 33 -> "UNSUPPORTED_SASL_MECHANISM",
    34 -> "ILLEGAL_SASL_STATE", 35 -> "UNSUPPORTED_VERSION",
    58 -> "SASL_AUTHENTICATION_FAILED")
  def errName(code: Int): String =
    errorNames.getOrElse(code, s"ERROR_$code")
}

/** The partition-operation surface the poller and sink consume —
  * implemented by [[KafkaClient]] (one broker) and [[KafkaRouter]]
  * (per-partition leader routing across a cluster).
  */
trait KafkaApi extends AutoCloseable {
  def partitions(topic: String): Seq[Int]
  def listOffset(topic: String, partition: Int, timestamp: Long): Long
  def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int = 1 << 20, maxWaitMs: Int = 100)
      : (Seq[KafkaProto.Record], Long)
  def produce(topic: String, partition: Int,
      records: Seq[(Option[String], String)], timestamp: Long = 0L): Long
}

/** Blocking Kafka client over one TCP connection (not thread-safe).
  * Speaks to one broker; [[KafkaRouter]] composes several of these
  * into per-partition leader routing for multi-broker clusters.
  */
final class KafkaClient(host: String, port: Int,
    clientId: String = "graft",
    username: Option[String] = None, password: Option[String] = None,
    timeoutMs: Int = 5000,
    produceCodec: String = "none") extends KafkaApi {

  import KafkaProto._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private val in =
    new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private var correlation = 0

  /** One request/response round trip (header v1: apiKey, apiVersion,
    * correlationId, clientId).
    */
  private def call(apiKey: Int, apiVersion: Int, body: Wire): Cursor = {
    correlation += 1
    val head = new Wire
    head.i16(apiKey).i16(apiVersion).i32(correlation)
      .nullableStr(Some(clientId))
    val payload = head.result() ++ body.result()
    val frame = new Wire
    frame.i32(payload.length).raw(payload)
    out.write(frame.result()); out.flush()
    val szb = new Array[Byte](4)
    in.readFully(szb)
    val sz = ByteBuffer.wrap(szb).getInt
    if (sz < 4 || sz > 64 * 1024 * 1024)
      throw new java.io.IOException(s"kafka: bad response size $sz")
    val resp = new Array[Byte](sz)
    in.readFully(resp)
    val c = new Cursor(ByteBuffer.wrap(resp))
    val corr = c.i32
    if (corr != correlation)
      throw new java.io.IOException(
        s"kafka: correlation mismatch (got $corr want $correlation)")
    c
  }

  /** ApiVersions v0 → apiKey -> (min, max). Run first, like every
    * real client: proves the peer speaks Kafka before anything else.
    */
  def apiVersions(): Map[Int, (Int, Int)] = {
    val c = call(18, 0, new Wire)
    val err = c.i16
    if (err != 0)
      throw new java.io.IOException(s"kafka: ApiVersions ${errName(err)}")
    val n = c.i32
    (0 until n).map { _ => (c.i16, (c.i16, c.i16)) }.toMap
  }

  /** SASL/PLAIN: SaslHandshake v1 then SaslAuthenticate v0 with the
    * RFC 4616 token. Auth failures surface as IOException with the
    * broker's error (the auth-failure isolation the spec pins).
    */
  private def saslPlain(user: String, pass: String): Unit = {
    val h = call(17, 1, new Wire().str("PLAIN"))
    val herr = h.i16
    if (herr != 0)
      throw new java.io.IOException(s"kafka: SaslHandshake ${errName(herr)}")
    val token = ("\u0000" + user + "\u0000" + pass).getBytes(UTF_8)
    val a = call(36, 0, new Wire().bytes(token))
    val aerr = a.i16
    if (aerr != 0) {
      val msg = a.nullableStr.getOrElse("")
      throw new java.io.IOException(
        s"kafka: SaslAuthenticate ${errName(aerr)} $msg".trim)
    }
  }

  // handshake: prove the peer speaks Kafka, then authenticate
  locally {
    apiVersions()
    for (u <- username; p <- password) saslPlain(u, p)
  }

  /** Metadata v4 → (brokers by node id, partition → leader node id)
    * of `topic` (created on demand when the broker allows
    * auto-creation, mirroring consumer bootstrap). The full cluster
    * view [[KafkaRouter]] routes with.
    */
  def metadataFor(topic: String): (Map[Int, (String, Int)], Map[Int, Int]) = {
    val body = new Wire
    body.array(Seq(topic))((w, t) => w.str(t))
      .bool(true) // allow_auto_topic_creation
    val c = call(3, 4, body)
    c.i32 // throttle
    val nb = c.i32
    val brokers = (0 until nb).map { _ =>
      val id = c.i32; val h = c.str; val p = c.i32; c.nullableStr // rack
      id -> (h, p)
    }.toMap
    c.nullableStr // cluster id
    c.i32         // controller
    val nt = c.i32
    val leaders = Map.newBuilder[Int, Int]
    (0 until nt).foreach { _ =>
      val terr = c.i16
      val name = c.str
      c.bool // is_internal
      val np = c.i32
      (0 until np).foreach { _ =>
        c.i16 // partition error
        val idx = c.i32
        val leader = c.i32
        val nr = c.i32; (0 until nr).foreach(_ => c.i32)
        val ni = c.i32; (0 until ni).foreach(_ => c.i32)
        if (name == topic) leaders += idx -> leader
      }
      if (name == topic && terr != 0 && terr != 5) // 5 = leader pending on create
        throw new java.io.IOException(s"kafka: Metadata($topic) ${errName(terr)}")
    }
    (brokers, leaders.result())
  }

  override def partitions(topic: String): Seq[Int] =
    metadataFor(topic)._2.keys.toSeq.sorted

  /** Produce v3 (acks=-1): one record batch to one partition; returns
    * the assigned base offset. The response IS the durability ack.
    */
  override def produce(topic: String, partition: Int,
      records: Seq[(Option[String], String)], timestamp: Long): Long = {
    val batch = encodeBatch(0L, records.map { case (k, v) =>
      (k.map(_.getBytes(UTF_8)), v.getBytes(UTF_8), timestamp)
    }, produceCodec)
    val body = new Wire
    body.nullableStr(None) // transactional_id
      .i16(-1)             // acks=all
      .i32(30000)          // timeout
      .array(Seq(topic)) { (w, t) =>
        w.str(t).array(Seq(partition)) { (w2, p) =>
          w2.i32(p).nullableBytes(Some(batch))
        }
      }
    val c = call(0, 3, body)
    val nt = c.i32
    var base = -1L
    (0 until nt).foreach { _ =>
      c.str
      val np = c.i32
      (0 until np).foreach { _ =>
        c.i32 // partition
        val err = c.i16
        val off = c.i64
        c.i64 // log_append_time
        if (err == 6)
          throw new NotLeader(
            s"kafka: Produce($topic/$partition) NOT_LEADER_OR_FOLLOWER")
        if (err != 0)
          throw new java.io.IOException(
            s"kafka: Produce($topic/$partition) ${errName(err)}")
        base = off
      }
    }
    c.i32 // throttle
    base
  }

  /** ListOffsets v1: timestamp -2 = earliest, -1 = latest (log end). */
  override def listOffset(topic: String, partition: Int,
      timestamp: Long): Long = {
    val body = new Wire
    body.i32(-1) // replica_id
      .array(Seq(topic)) { (w, t) =>
        w.str(t).array(Seq(partition))((w2, p) => { w2.i32(p).i64(timestamp); () })
      }
    val c = call(2, 1, body)
    val nt = c.i32
    var result = -1L
    (0 until nt).foreach { _ =>
      c.str
      val np = c.i32
      (0 until np).foreach { _ =>
        c.i32 // partition
        val err = c.i16
        c.i64 // timestamp
        val off = c.i64
        if (err == 6)
          throw new NotLeader(
            s"kafka: ListOffsets($topic/$partition) NOT_LEADER_OR_FOLLOWER")
        if (err != 0)
          throw new java.io.IOException(
            s"kafka: ListOffsets($topic/$partition) ${errName(err)}")
        result = off
      }
    }
    result
  }

  /** Fetch v4 from one partition → (records from `offset`, high
    * watermark). Empty seq when caught up (maxWaitMs elapsed with
    * nothing new).
    */
  override def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int, maxWaitMs: Int): (Seq[Record], Long) = {
    val body = new Wire
    body.i32(-1)        // replica_id
      .i32(maxWaitMs)
      .i32(1)           // min_bytes
      .i32(maxBytes)
      .i8(0)            // isolation_level: read_uncommitted
      .array(Seq(topic)) { (w, t) =>
        w.str(t).array(Seq(partition)) { (w2, p) =>
          w2.i32(p).i64(offset).i32(maxBytes)
        }
      }
    val c = call(1, 4, body)
    c.i32 // throttle
    val nt = c.i32
    var recs: Seq[Record] = Nil
    var hw = -1L
    (0 until nt).foreach { _ =>
      c.str
      val np = c.i32
      (0 until np).foreach { _ =>
        c.i32 // partition
        val err = c.i16
        hw = c.i64
        c.i64 // last_stable_offset
        val na = c.i32 // aborted txns (nullable array)
        if (na > 0) (0 until na).foreach { _ => c.i64; c.i64 }
        val rs = c.nullableBytes
        if (err == 1)
          throw new OffsetOutOfRange(
            s"kafka: Fetch($topic/$partition@$offset) OFFSET_OUT_OF_RANGE")
        if (err == 6)
          throw new NotLeader(
            s"kafka: Fetch($topic/$partition@$offset) NOT_LEADER_OR_FOLLOWER")
        if (err != 0)
          throw new java.io.IOException(
            s"kafka: Fetch($topic/$partition@$offset) ${errName(err)}")
        recs = rs.filter(_.nonEmpty).map(decodeBatches)
          .getOrElse(Nil).filter(_.offset >= offset)
      }
    }
    (recs, hw)
  }

  override def close(): Unit = socket.close()
}

/** Per-partition leader routing across a multi-broker cluster — the
  * layer a single-bootstrap deployment needs when the bootstrap
  * broker does NOT lead every partition (the normal Kafka topology;
  * real clients do exactly this). One [[KafkaClient]] per broker,
  * opened lazily from the Metadata broker list; every partition
  * operation goes to that partition's leader, and a broker answering
  * NOT_LEADER_OR_FOLLOWER (leadership moved — reassignment, broker
  * restart) triggers ONE metadata refresh and a re-route before the
  * error propagates. Not thread-safe, like [[KafkaClient]] — the
  * poller owns one per thread, the sink one per task.
  */
final class KafkaRouter(bootstrapHost: String, bootstrapPort: Int,
    clientId: String = "graft",
    username: Option[String] = None, password: Option[String] = None,
    timeoutMs: Int = 5000,
    produceCodec: String = "none") extends KafkaApi {

  private val clients =
    scala.collection.mutable.Map.empty[(String, Int), KafkaClient]
  private var brokers: Map[Int, (String, Int)] = Map.empty
  private var leaders: Map[(String, Int), Int] = Map.empty

  private def clientAt(host: String, port: Int): KafkaClient =
    clients.getOrElseUpdate((host, port),
      new KafkaClient(host, port, clientId, username, password, timeoutMs,
        produceCodec))

  // bootstrap connects eagerly: bad config fails fast, like KafkaClient
  locally { clientAt(bootstrapHost, bootstrapPort); () }

  private def refresh(topic: String): Seq[Int] = {
    val (bs, ls) = clientAt(bootstrapHost, bootstrapPort).metadataFor(topic)
    brokers = bs
    leaders = leaders.filterNot(_._1._1 == topic) ++
      ls.map { case (p, n) => (topic, p) -> n }
    ls.keys.toSeq.sorted
  }

  private def leaderClient(topic: String, partition: Int): KafkaClient = {
    if (!leaders.contains((topic, partition))) refresh(topic)
    val node = leaders.getOrElse((topic, partition),
      throw new java.io.IOException(
        s"kafka: no leader for $topic/$partition in metadata"))
    val (h, p) = brokers.getOrElse(node,
      throw new java.io.IOException(
        s"kafka: leader node $node of $topic/$partition not in broker list"))
    clientAt(h, p)
  }

  /** Run `f` against the partition's leader; on NOT_LEADER (stale
    * view) refresh metadata once and re-route.
    */
  private def routed[A](topic: String, partition: Int)
      (f: KafkaClient => A): A =
    try f(leaderClient(topic, partition))
    catch {
      case _: KafkaProto.NotLeader =>
        refresh(topic)
        f(leaderClient(topic, partition))
    }

  override def partitions(topic: String): Seq[Int] = refresh(topic)
  override def listOffset(topic: String, partition: Int,
      timestamp: Long): Long =
    routed(topic, partition)(_.listOffset(topic, partition, timestamp))
  override def fetch(topic: String, partition: Int, offset: Long,
      maxBytes: Int, maxWaitMs: Int): (Seq[KafkaProto.Record], Long) =
    routed(topic, partition)(
      _.fetch(topic, partition, offset, maxBytes, maxWaitMs))
  override def produce(topic: String, partition: Int,
      records: Seq[(Option[String], String)], timestamp: Long): Long =
    routed(topic, partition)(
      _.produce(topic, partition, records, timestamp))

  override def close(): Unit = {
    clients.values.foreach(c => try c.close() catch { case _: Exception => () })
    clients.clear()
  }
}

/** Driver-side consumer loop (the reference's single StreamConsumer,
  * kafka.rs:249-311, minus rebalancing — ONE member, every
  * partition): fetches each partition on the poll interval, spools
  * JSON values as atomic NDJSON, tracks offsets in memory. Same spool
  * seam as REST/Kinesis/Redis: past the single-connection ceiling,
  * bind spark-sql-kafka for executor-parallel ingestion.
  */
final class KafkaPoller private (connect: () => KafkaApi,
    firstClient: KafkaApi, topic: String, spoolDir: String,
    startAt: String, pollIntervalMs: Long, maxReconnects: Int)
    extends PollerHealth {

  @volatile private var client: KafkaApi = firstClient
  @volatile private var running = true
  @volatile private var records = 0L
  @volatile private var failures = 0L
  @volatile private var reconnected = 0L
  @volatile private var terminal: Option[Throwable] = None

  private var spoolSeq = 0L
  private def spool(lines: Seq[String]): Unit = if (lines.nonEmpty) {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // file names carry a zero-padded arrival sequence: lexicographic
    // listing order IS arrival order, which the batch `.from` route
    // turns into deterministic synthetic event time (boundSource)
    val id = f"$spoolSeq%016d-${java.util.UUID.randomUUID().toString}"
    spoolSeq += 1
    val tmp = dir.resolve(s".tmp-$id")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(s"part-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private val thread = new Thread(() => {
    var backoffMs = 500L
    var attempts = 0
    // tracked offsets SURVIVE reconnects — the consumer resumes where
    // it left off, like the reference's committed offsets
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    val resetTs = if (startAt == "earliest") -2L else -1L
    while (running && terminal.isEmpty) {
      try {
        if (offsets.isEmpty) {
          val parts = client.partitions(topic)
          if (parts.isEmpty) {
            // topic auto-created with the leader still pending
            // (Metadata error 5 tolerated): re-query metadata after
            // the poll interval instead of entering the poll loop
            // with no partitions and spinning forever while looking
            // healthy
            Thread.sleep(pollIntervalMs)
          } else parts.foreach { p =>
            offsets(p) = client.listOffset(topic, p, resetTs)
          }
        }
        while (running && offsets.nonEmpty) {
          offsets.keys.toSeq.sorted.foreach { p =>
            val (recs, _) =
              try client.fetch(topic, p, offsets(p))
              catch {
                // log truncated/retained past our position: re-resolve
                // per the startAt policy (auto.offset.reset) rather
                // than burning reconnect attempts refetching the same
                // invalid offset
                case _: KafkaProto.OffsetOutOfRange =>
                  offsets(p) = client.listOffset(topic, p, resetTs)
                  client.fetch(topic, p, offsets(p))
              }
            if (recs.nonEmpty) {
              val vals = recs.map(r => new String(r.value, UTF_8).trim)
              val (ok, bad) = vals.partition(v =>
                v.startsWith("{") && v.endsWith("}"))
              spool(ok.map(_.replaceAll("[\n\r]+", " ")))
              records += ok.length
              failures += bad.length
              offsets(p) = recs.map(_.offset).max + 1
              attempts = 0; backoffMs = 500L
            }
          }
          if (running) Thread.sleep(pollIntervalMs)
        }
      } catch {
        case _: InterruptedException => ()
        // ANY failure while running=true — connection loss (IO) or a
        // NON-IO decode error (CRC mismatch / bad magic / unsupported
        // codec → IllegalArgumentException) — routes through the same
        // reconnect-then-terminal path: a reconnect resyncs framing
        // and refetches from the tracked offsets, and a persistently
        // corrupt topic exhausts retries into terminalError. No
        // exception may kill this thread while isDead still reads
        // false (clean stop() stays silent below).
        case e: Throwable if running =>
          // release the dead socket NOW: a half-open client keeps the
          // broker side in FIN_WAIT_2 and can block a same-port restart
          try client.close() catch { case _: Exception => () }
          attempts += 1
          if (attempts > maxReconnects) {
            terminal = Some(e)
            System.err.println(
              s"graft-kafka-poller: terminal after $maxReconnects " +
                s"reconnect attempts: $e")
          } else {
            System.err.println(s"graft-kafka-poller: connection lost " +
              s"($e); reconnect #$attempts in ${backoffMs}ms")
            val interrupted =
              try { Thread.sleep(backoffMs); false }
              catch { case _: InterruptedException => true } // stop()
            if (!interrupted) {
              backoffMs = math.min(backoffMs * 2, 30000L)
              try {
                client = connect()
                reconnected += 1
              } catch {
                case _: Exception => () // next pass retries
              }
            }
          }
        case _: Throwable if !running => ()
      }
    }
  }, s"graft-kafka-poller-$topic")
  thread.setDaemon(true)

  def recordCount: Long = records
  override def deliveredCount: Long = records
  override def healthFailures: Long = failures
  override def healthReconnects: Long = reconnected
  def failureCount: Long = failures
  def reconnectCount: Long = reconnected
  /** The exception that killed the poll loop, if any — None while
    * healthy or after a clean stop().
    */
  def terminalError: Option[Throwable] = terminal
  def isDead: Boolean = terminal.isDefined

  def stop(): Unit = {
    running = false
    thread.interrupt()
    thread.join(5000)
    client.close()
  }
}

object KafkaPoller {
  /** startAt mirrors auto.offset.reset (kafka.rs:231: latest default;
    * "earliest" replays the retained log). `connect` is invoked once
    * here (bad config fails fast) and again on each reconnect.
    */
  def start(connect: () => KafkaApi, topic: String, spoolDir: String,
      startAt: String = "latest", pollIntervalMs: Long = 100L,
      maxReconnects: Int = 8): KafkaPoller = {
    val p = new KafkaPoller(connect, connect(), topic, spoolDir, startAt,
      pollIntervalMs, maxReconnects)
    p.thread.start()
    p
  }
}

/** Registry-facing Kafka connector: reads come off the poller's
  * landing directory; write produces each Spark partition's rows
  * through its own connection in bounded chunks at acks=-1, chunk c
  * of partition p landing on topic partition (p + c) mod P — all
  * topic partitions receive load without any cross-executor
  * coordination. `key` optionally stamps every record with a fixed
  * key (the reference keys by event_type, kafka.rs:350).
  */
final case class KafkaConnector(
    name: String,
    host: String,
    port: Int,
    topic: String,
    spoolDir: String,
    username: Option[String] = None,
    password: Option[String] = None,
    key: Option[String] = None,
    batchSize: Int = 500,
    timeoutMs: Int = 5000,
    compression: String = "none") extends Connector {

  // fail at CONSTRUCTION, not in an executor task: a misconfigured
  // codec name surfaces where the connector is declared
  locally {
    KafkaProto.encodeBatch(0L,
      Seq((None, Array[Byte](123, 125), 0L)), compression)
    ()
  }

  /** Re-aim at another topic. The landing dir becomes the per-topic
    * subdir `spoolDir/target`, so two `.from(conn, topic:)` streams of
    * one declared connector never read each other's events — point the
    * topic's poller at the same subdir.
    */
  override def withTarget(target: String): Connector =
    // same character sanitization as the MQTT/NATS/Redis connectors:
    // a topic containing '/' or '..' must not land the spool outside
    // the configured root
    copy(topic = target,
      spoolDir = s"$spoolDir/${target.replaceAll("[^A-Za-z0-9._-]", "_")}")

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(spoolDir)
  }

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(spoolDir)

  override def write(df: DataFrame): Unit = {
    val (h, p, t, chunk, to) = (host, port, topic, batchSize, timeoutMs)
    val (u, pw, k) = (username, password, key)
    val codec = compression
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // router, not bare client: each chunk's produce goes to the
        // target partition's LEADER (host/port is only the bootstrap)
        val client = new KafkaRouter(h, p, s"graft-sink-$pid", u, pw, to,
          produceCodec = codec)
        try {
          val parts = client.partitions(t)
          require(parts.nonEmpty, s"kafka: topic $t has no partitions")
          var c = 0
          it.grouped(chunk).foreach { rows =>
            val target = parts((pid + c) % parts.length)
            // stamp real produce time (CreateTime): epoch-0 records
            // are instantly past any time-based retention window
            client.produce(t, target, rows.map(r => (k, r)),
              timestamp = System.currentTimeMillis())
            c += 1
          }
        } finally client.close()
      }
    }
  }
}
