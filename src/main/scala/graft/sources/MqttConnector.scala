package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL MQTT 3.1.1 transport for the connector surface (reference
  * connector/mqtt.rs — one of the two connectors the reference ships
  * non-stubbed) — actual binary packet encoding over TCP, zero new
  * dependencies, loopback-tested like HTTP/Redis/NATS. The
  * reference's config surface (mqtt.rs:22-66): broker, topic,
  * optional client_id / username+password, QoS 0|1|2; its source
  * subscribes and turns JSON payloads into events, its sink
  * publishes each event's JSON.
  *
  * graft implements the MQTT 3.1.1 spec packets the connector needs:
  * CONNECT/CONNACK (clean session, user/pass flags; CONNACK return
  * codes 4/5 surface as auth errors), SUBSCRIBE/SUBACK,
  * PUBLISH/PUBACK at QoS 0 and QoS 1, PINGREQ/PINGRESP, DISCONNECT.
  * QoS 2's four-way handshake is REJECTED with a pointed error (the
  * reference maps it through rumqttc; graft's sink semantics are
  * at-least-once like every Spark task retry, so exactly-once must
  * come from idempotent downstream keys, not the transport).
  *
  * Same distribution shape as Redis/NATS: ONE driver-side
  * subscription spools JSON payloads as atomic NDJSON for the file
  * source; the sink publishes executor-side, one connection per
  * partition — QoS 0 chunks sealed by a PINGREQ/PINGRESP barrier,
  * QoS 1 chunks collecting one PUBACK per message before the task
  * may succeed.
  *
  * Spool ceiling, measured on loopback (ConnectorThroughputSpec):
  * ~9-13k msg/s per subscriber thread at QoS 0. Past that, use MQTT
  * shared subscriptions ($share/group/topic, one subscriber per
  * share) or the bahir executor-parallel binding where it ships.
  */
private[graft] object MqttProto {
  // -- encoding ------------------------------------------------------
  def varint(n: Int): Array[Byte] = {
    require(n >= 0 && n < 268435456, s"mqtt: bad remaining length $n")
    val out = Array.newBuilder[Byte]
    var x = n
    var continue = true
    while (continue) {
      val d = x % 128; x /= 128
      out += (if (x > 0) (d | 0x80) else d).toByte
      continue = x > 0
    }
    out.result()
  }

  def lenPrefixed(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    Array(((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  def packet(typeAndFlags: Int, body: Array[Byte]): Array[Byte] =
    Array(typeAndFlags.toByte) ++ varint(body.length) ++ body

  def connect(clientId: String, username: Option[String],
      password: Option[String], keepAliveSec: Int = 60): Array[Byte] = {
    var flags = 0x02 // clean session
    if (username.isDefined) flags |= 0x80
    if (password.isDefined) flags |= 0x40
    val body = lenPrefixed("MQTT") ++ Array(4.toByte, flags.toByte,
      ((keepAliveSec >> 8) & 0xff).toByte, (keepAliveSec & 0xff).toByte) ++
      lenPrefixed(clientId) ++
      username.map(lenPrefixed).getOrElse(Array.empty[Byte]) ++
      password.map(lenPrefixed).getOrElse(Array.empty[Byte])
    packet(0x10, body)
  }

  def publish(topic: String, payload: Array[Byte], qos: Int,
      packetId: Int): Array[Byte] = {
    val vh = lenPrefixed(topic) ++ (if (qos > 0)
      Array(((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte)
    else Array.empty[Byte])
    packet(0x30 | (qos << 1), vh ++ payload)
  }

  def subscribe(topic: String, qos: Int, packetId: Int): Array[Byte] =
    packet(0x82, Array(((packetId >> 8) & 0xff).toByte,
      (packetId & 0xff).toByte) ++ lenPrefixed(topic) ++ Array(qos.toByte))

  def puback(packetId: Int): Array[Byte] =
    packet(0x40, Array(((packetId >> 8) & 0xff).toByte,
      (packetId & 0xff).toByte))

  val pingreq: Array[Byte] = Array(0xC0.toByte, 0x00)
  val pingresp: Array[Byte] = Array(0xD0.toByte, 0x00)
  val disconnect: Array[Byte] = Array(0xE0.toByte, 0x00)

  // -- decoding ------------------------------------------------------
  /** (typeAndFlags, body) of the next packet. */
  def read(in: DataInputStream): (Int, Array[Byte]) = {
    val t = in.read()
    if (t < 0) throw new EOFException("mqtt: connection closed")
    var len = 0
    var mult = 1
    var d = 0
    do {
      d = in.read()
      if (d < 0) throw new EOFException("mqtt: connection closed")
      len += (d & 0x7f) * mult
      mult *= 128
    } while ((d & 0x80) != 0)
    val body = new Array[Byte](len)
    in.readFully(body)
    (t & 0xff, body)
  }

  def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PUBLISH body → (topic, qos, packetId, payload). */
  def parsePublish(typeAndFlags: Int, body: Array[Byte]):
      (String, Int, Int, Array[Byte]) = {
    val qos = (typeAndFlags >> 1) & 0x03
    val tlen = u16(body, 0)
    val topic = new String(body, 2, tlen, UTF_8)
    var off = 2 + tlen
    val pid = if (qos > 0) { val p = u16(body, off); off += 2; p } else 0
    (topic, qos, pid, java.util.Arrays.copyOfRange(body, off, body.length))
  }
}

/** Blocking MQTT 3.1.1 client over one TCP connection (not
  * thread-safe). `qos` 0 or 1; 2 is rejected.
  */
final class MqttClient(host: String, port: Int, clientId: String,
    username: Option[String] = None, password: Option[String] = None,
    timeoutMs: Int = 5000) extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private[sources] val in =
    new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private var nextPacketId = 1

  locally {
    out.write(MqttProto.connect(clientId, username, password))
    out.flush()
    val (t, body) = MqttProto.read(in)
    if ((t >> 4) != 2)
      throw new java.io.IOException(s"mqtt: expected CONNACK, got type ${t >> 4}")
    body(1) match {
      case 0 => ()
      case 4 => throw new java.io.IOException("mqtt: bad user name or password")
      case 5 => throw new java.io.IOException("mqtt: not authorized")
      case rc => throw new java.io.IOException(s"mqtt: CONNACK rc=$rc")
    }
  }

  private def freshId(): Int = {
    val id = nextPacketId
    nextPacketId = if (nextPacketId == 65535) 1 else nextPacketId + 1
    id
  }

  /** Fire-and-forget PINGREQ — the subscriber loop's keepalive.
    * CONNECT advertises keepAliveSec, so a spec-compliant broker
    * drops a client silent for 1.5× that; the subscriber's idle
    * branch calls this and its reader consumes the PINGRESP
    * (nextMessage skips type 13), keeping the session alive with no
    * second read path.
    */
  def keepalive(): Unit = { out.write(MqttProto.pingreq); out.flush() }

  /** PINGREQ/PINGRESP round trip — the QoS-0 flush barrier. */
  def ping(): Unit = {
    out.write(MqttProto.pingreq); out.flush()
    val (t, _) = MqttProto.read(in)
    if ((t >> 4) != 13)
      throw new java.io.IOException(s"mqtt: expected PINGRESP, got ${t >> 4}")
  }

  def publish(topic: String, msg: String, qos: Int = 0): Unit = {
    require(qos == 0 || qos == 1,
      "mqtt: QoS 2 not supported — Spark task retries make the sink " +
        "at-least-once regardless; use idempotent downstream keys")
    val pid = if (qos > 0) freshId() else 0
    out.write(MqttProto.publish(topic, msg.getBytes(UTF_8), qos, pid))
    out.flush()
    if (qos == 1) awaitPuback(1)
  }

  /** Chunked batch: all PUBLISH frames in one flush; QoS 1 then
    * collects one PUBACK per message, QoS 0 seals with the PING
    * barrier — either way the call returns only once the broker
    * consumed the chunk.
    */
  def publishAll(topic: String, msgs: Seq[String], qos: Int = 0): Unit = {
    require(qos == 0 || qos == 1, "mqtt: QoS 2 not supported")
    msgs.foreach { m =>
      val pid = if (qos > 0) freshId() else 0
      out.write(MqttProto.publish(topic, m.getBytes(UTF_8), qos, pid))
    }
    out.flush()
    if (qos == 1) awaitPuback(msgs.length) else ping()
  }

  private def awaitPuback(n: Int): Unit = {
    var left = n
    while (left > 0) {
      val (t, _) = MqttProto.read(in)
      (t >> 4) match {
        case 4  => left -= 1
        case 13 => () // stray PINGRESP
        case o  => throw new java.io.IOException(s"mqtt: expected PUBACK, got $o")
      }
    }
  }

  def subscribe(topic: String, qos: Int = 0): Unit = {
    val pid = freshId()
    out.write(MqttProto.subscribe(topic, qos, pid)); out.flush()
    val (t, body) = MqttProto.read(in)
    if ((t >> 4) != 9)
      throw new java.io.IOException(s"mqtt: expected SUBACK, got ${t >> 4}")
    if ((body(2) & 0xff) == 0x80)
      throw new java.io.IOException("mqtt: subscription rejected")
  }

  /** Next PUBLISH payload delivered to this subscriber; QoS 1
    * deliveries are PUBACKed (at-least-once acknowledged).
    */
  def nextMessage(): String = {
    var res: String = null
    while (res == null) {
      val (t, body) = MqttProto.read(in)
      (t >> 4) match {
        case 3 =>
          val (_, qos, pid, payload) = MqttProto.parsePublish(t, body)
          if (qos > 0) { out.write(MqttProto.puback(pid)); out.flush() }
          res = new String(payload, UTF_8)
        case 13 => () // PINGRESP
        case o => throw new java.io.IOException(s"mqtt: unexpected type $o")
      }
    }
    res
  }

  override def close(): Unit = {
    try { out.write(MqttProto.disconnect); out.flush() }
    catch { case _: java.io.IOException => () }
    socket.close()
  }
}

/** Driver-side subscriber: one subscription, JSON payloads spooled
  * atomically as NDJSON; non-JSON counted and skipped (mqtt.rs warns
  * and continues). A dropped connection RECONNECTS with exponential
  * backoff (0.5 s doubling to 30 s, `maxReconnects` attempts before
  * giving up — matching the reference source loops' backoff shape,
  * kafka.rs:299-303); only exhausted retries set [[terminalError]].
  */
final class MqttSubscriber private (connect: () => MqttClient,
    firstClient: MqttClient, spoolDir: String, timeoutMs: Int,
    maxReconnects: Int) extends PollerHealth {

  @volatile private var client: MqttClient = firstClient
  @volatile private var running = true
  @volatile private var messages = 0L
  @volatile private var failures = 0L
  @volatile private var reconnected = 0L
  @volatile private var terminal: Option[Throwable] = None

  private var spoolSeq = 0L
  private def spool(line: String): Unit = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // zero-padded arrival sequence in the name: lexicographic listing
    // order IS arrival order (boundSource derives deterministic
    // synthetic event time from it on the batch `.from` route)
    val id = f"$spoolSeq%016d-${java.util.UUID.randomUUID().toString}"
    spoolSeq += 1
    val tmp = dir.resolve(s".tmp-$id")
    Files.write(tmp, (line + "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(s"part-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private val thread = new Thread(() => {
    var backoffMs = 500L
    var attempts = 0
    while (running && terminal.isEmpty) {
      try {
        while (running) {
          try {
            val payload = client.nextMessage().trim
            if (payload.startsWith("{") && payload.endsWith("}")) {
              spool(payload.replaceAll("[\n\r]+", " ")); messages += 1
            } else failures += 1
            attempts = 0; backoffMs = 500L // healthy again
          } catch {
            // idle past the socket timeout: keep the MQTT session
            // alive (CONNECT promised keepAliveSec; a silent client
            // gets disconnected by a spec-compliant broker)
            case _: java.net.SocketTimeoutException => client.keepalive()
          }
        }
      } catch {
        // ANY failure while running=true — connection loss (IO) or a
        // NON-IO decode error (malformed remaining-length, unexpected
        // packet type) — routes through the same reconnect-then-
        // terminal path: a reconnect resyncs packet framing, and a
        // persistently corrupt peer exhausts retries into
        // terminalError. No exception may kill this thread while
        // isDead still reads false (a clean stop() lands below with
        // running=false and stays silent).
        case e: Throwable if running =>
          // release the dead socket NOW: a half-open client keeps the
          // broker side in FIN_WAIT_2 and can block a same-port restart
          try client.close() catch { case _: Exception => () }
          attempts += 1
          if (attempts > maxReconnects) {
            terminal = Some(e)
            System.err.println(
              s"graft-mqtt-subscriber: terminal after $maxReconnects " +
                s"reconnect attempts: $e")
          } else {
            System.err.println(s"graft-mqtt-subscriber: connection lost " +
              s"($e); reconnect #$attempts in ${backoffMs}ms")
            val interrupted =
              try { Thread.sleep(backoffMs); false }
              catch { case _: InterruptedException => true } // stop()
            if (!interrupted) {
              backoffMs = math.min(backoffMs * 2, 30000L)
              try {
                val fresh = connect() // connects AND re-subscribes
                client = fresh
                reconnected += 1
              } catch {
                case _: Exception => () // next pass retries
              }
            }
          }
        case _: Throwable if !running => ()
      }
    }
  }, "graft-mqtt-subscriber")
  thread.setDaemon(true)

  def messageCount: Long = messages
  def failureCount: Long = failures
  def reconnectCount: Long = reconnected
  override def deliveredCount: Long = messages
  override def healthFailures: Long = failures
  override def healthReconnects: Long = reconnected
  /** The exception that killed the spool thread, if any — None while
    * healthy or after a clean stop(). A Some here means ingestion
    * halted (reconnect retries exhausted) and the landing dir will
    * never grow again.
    */
  def terminalError: Option[Throwable] = terminal
  def isDead: Boolean = terminal.isDefined

  def stop(): Unit = {
    running = false
    client.close()
    thread.interrupt() // break a backoff sleep
    thread.join(timeoutMs.toLong * 2)
  }
}

object MqttSubscriber {
  def start(host: String, port: Int, topic: String, spoolDir: String,
      clientId: String = "graft-sub", qos: Int = 0,
      username: Option[String] = None, password: Option[String] = None,
      timeoutMs: Int = 2000, maxReconnects: Int = 8): MqttSubscriber = {
    def connect(): MqttClient = {
      val c = new MqttClient(host, port, clientId, username, password,
        timeoutMs)
      c.subscribe(topic, qos)
      c
    }
    // first connect in the caller's thread: bad config fails fast
    val s = new MqttSubscriber(() => connect(), connect(), spoolDir,
      timeoutMs, maxReconnects)
    s.thread.start()
    s
  }
}

/** Registry-facing MQTT connector: reads come off the subscriber's
  * landing directory; write publishes each row's JSON to the topic
  * through per-partition connections in bounded chunks at the
  * configured QoS.
  */
final case class MqttConnector(
    name: String,
    host: String,
    port: Int,
    topic: String,
    spoolDir: String,
    clientId: Option[String] = None,
    username: Option[String] = None,
    password: Option[String] = None,
    qos: Int = 0,
    batchSize: Int = 1000,
    timeoutMs: Int = 5000) extends Connector {

  /** Re-aim at another topic; the landing dir becomes the per-topic
    * subdir `spoolDir/target` (see KafkaConnector.withTarget).
    */
  override def withTarget(target: String): Connector =
    copy(topic = target, spoolDir =
      s"$spoolDir/${target.replaceAll("[^A-Za-z0-9._-]", "_")}")

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(spoolDir)
  }

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(spoolDir)

  override def write(df: DataFrame): Unit = {
    val (h, p, t, q, chunk, to) = (host, port, topic, qos, batchSize, timeoutMs)
    val (cid, u, pw) = (clientId, username, password)
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val id = cid.getOrElse("graft-sink-" +
          java.util.UUID.randomUUID().toString.take(8))
        val client = new MqttClient(h, p, id, u, pw, to)
        try it.grouped(chunk).foreach(rows => client.publishAll(t, rows, q))
        finally client.close()
      }
    }
  }
}
