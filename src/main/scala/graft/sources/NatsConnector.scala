package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL NATS transport for the connector surface (reference
  * connector/nats.rs) — the actual text wire protocol
  * (INFO/CONNECT/PUB/SUB/MSG/PING/PONG, docs.nats.io client protocol)
  * over TCP, zero new dependencies, loopback-tested like the
  * HTTP/Redis connectors. The reference's connector (feature-gated
  * behind `nats`) subscribes to a subject — optionally as a QUEUE
  * GROUP member, NATS's load-balanced delivery mode
  * (nats.rs:101-106) — and turns JSON payloads into events; its sink
  * publishes each event's JSON to the subject (nats.rs:218); auth is
  * user/password or token, carried in CONNECT options.
  *
  * graft's shape mirrors the Redis connector: ONE driver-side
  * subscription spools JSON messages atomically as NDJSON into a
  * landing dir for Spark's file source (at-most-once transient
  * delivery makes competing executor subscribers wrong, and a queue
  * group would instead SPLIT the stream across them); the sink runs
  * executor-side, one connection per partition, PUB frames streamed
  * in bounded flush chunks with a trailing PING/PONG barrier — NATS
  * publishes are fire-and-forget, so the barrier is what guarantees
  * the server consumed every frame before the Spark task reports
  * success.
  *
  * Spool ceiling, measured on loopback (ConnectorThroughputSpec):
  * ~11-18k msg/s per subscriber thread. Past that, run multiple
  * queue-group members (each its own landing dir) — NATS splits the
  * subject across them — before reaching for an executor-parallel
  * receiver.
  */
private[graft] object NatsProto {
  /** Read one \r\n-terminated control line. */
  def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("nats: connection closed")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("nats: expected \\n")
    sb.toString
  }

  /** Read an exact payload + its trailing \r\n. */
  def readPayload(in: DataInputStream, n: Int): String = {
    val buf = new Array[Byte](n)
    in.readFully(buf)
    if (in.read() != '\r' || in.read() != '\n')
      throw new java.io.IOException("nats: payload not \\r\\n-terminated")
    new String(buf, UTF_8)
  }

  def pub(subject: String, msg: String): Array[Byte] = {
    val p = msg.getBytes(UTF_8)
    val head = s"PUB $subject ${p.length}\r\n".getBytes(UTF_8)
    head ++ p ++ "\r\n".getBytes(UTF_8)
  }
}

/** Blocking NATS client over one TCP connection (not thread-safe). */
final class NatsClient(host: String, port: Int,
    username: Option[String] = None, password: Option[String] = None,
    token: Option[String] = None, timeoutMs: Int = 5000)
    extends AutoCloseable {

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private[sources] val in =
    new DataInputStream(new BufferedInputStream(socket.getInputStream))

  // Messages that arrive while we are waiting for a PONG barrier
  // (published between SUB registration and the PONG, say) — buffered
  // here instead of desyncing the stream, drained by nextMessage().
  private val pending = new scala.collection.mutable.Queue[String]

  // Handshake: server leads with INFO {...}; client answers CONNECT.
  // verbose:false suppresses +OK acks (the standard client mode);
  // auth rides in the CONNECT options like the reference's
  // with_credentials / with_token (nats.rs:47-58) — values
  // JSON-escaped so a quote or backslash in a credential cannot
  // produce a malformed CONNECT frame.
  locally {
    val info = NatsProto.readLine(in)
    if (!info.startsWith("INFO "))
      throw new java.io.IOException(s"nats: expected INFO, got $info")
    import JsonStr.{escape => esc}
    val auth = (username, password, token) match {
      case (Some(u), Some(p), _) =>
        s""","user":"${esc(u)}","pass":"${esc(p)}""""
      case (_, _, Some(t)) => s""","auth_token":"${esc(t)}""""
      case _               => ""
    }
    out.write((s"""CONNECT {"verbose":false,"pedantic":false$auth}""" +
      "\r\n").getBytes(UTF_8))
    out.flush()
  }

  private def expectPong(): Unit = {
    var line = NatsProto.readLine(in)
    // the server may interleave its own PING (answer it) or deliver
    // a MSG for an already-registered subscription (buffer it —
    // throwing would leave the payload unread and desync the stream)
    while (line == "PING" || line.startsWith("MSG ")) {
      if (line == "PING") {
        out.write("PONG\r\n".getBytes(UTF_8)); out.flush()
      } else {
        pending.enqueue(NatsProto.readPayload(in, line.split(" ").last.toInt))
      }
      line = NatsProto.readLine(in)
    }
    if (line.startsWith("-ERR"))
      throw new java.io.IOException(s"nats: $line")
    if (line != "PONG")
      throw new java.io.IOException(s"nats: expected PONG, got $line")
  }

  /** PING/PONG round trip — the flush barrier (and the auth check:
    * a rejected CONNECT surfaces as -ERR here).
    */
  def ping(): Unit = {
    out.write("PING\r\n".getBytes(UTF_8)); out.flush()
    expectPong()
  }

  def publish(subject: String, msg: String): Unit = {
    out.write(NatsProto.pub(subject, msg))
    out.flush()
  }

  /** Fire-and-forget batch: all PUB frames in one flush, then the
    * PING barrier confirms the server consumed them.
    */
  def publishAll(subject: String, msgs: Seq[String]): Unit = {
    msgs.foreach(m => out.write(NatsProto.pub(subject, m)))
    out.flush()
    ping()
  }

  def subscribe(subject: String, sid: String,
      queueGroup: Option[String] = None): Unit = {
    val q = queueGroup.fold("")(g => s" $g")
    out.write(s"SUB $subject$q $sid\r\n".getBytes(UTF_8))
    out.flush()
    ping() // barrier: subscription registered (or -ERR)
  }

  /** Next delivered message payload (answers server PINGs inline).
    * Throws SocketTimeoutException when idle past the socket timeout.
    */
  def nextMessage(): String = {
    if (pending.nonEmpty) return pending.dequeue()
    var line = NatsProto.readLine(in)
    while (line == "PING" || line == "PONG" || line.startsWith("+OK")) {
      if (line == "PING") { out.write("PONG\r\n".getBytes(UTF_8)); out.flush() }
      line = NatsProto.readLine(in)
    }
    if (line.startsWith("-ERR")) throw new java.io.IOException(s"nats: $line")
    if (!line.startsWith("MSG "))
      throw new java.io.IOException(s"nats: expected MSG, got $line")
    // MSG <subject> <sid> [reply-to] <#bytes>
    val parts = line.split(" ")
    NatsProto.readPayload(in, parts.last.toInt)
  }

  override def close(): Unit = socket.close()
}

/** Driver-side subscriber: one subscription (plain or queue-group),
  * each JSON message spooled atomically as one NDJSON line; non-JSON
  * payloads counted and skipped (the reference warns and continues,
  * nats.rs:136-147). A dropped connection RECONNECTS with exponential
  * backoff (0.5 s doubling to 30 s, `maxReconnects` attempts); only
  * exhausted retries set [[terminalError]].
  */
final class NatsSubscriber private (connect: () => NatsClient,
    firstClient: NatsClient, spoolDir: String, timeoutMs: Int,
    maxReconnects: Int) extends PollerHealth {

  @volatile private var client: NatsClient = firstClient
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
            attempts = 0; backoffMs = 500L
          } catch {
            case _: java.net.SocketTimeoutException => () // idle
          }
        }
      } catch {
        // ANY failure while running=true — connection loss (IO) or a
        // NON-IO decode error (malformed MSG header → NumberFormat-
        // Exception) — routes through the same reconnect-then-
        // terminal path: a reconnect resyncs line framing, and a
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
              s"graft-nats-subscriber: terminal after $maxReconnects " +
                s"reconnect attempts: $e")
          } else {
            System.err.println(s"graft-nats-subscriber: connection lost " +
              s"($e); reconnect #$attempts in ${backoffMs}ms")
            val interrupted =
              try { Thread.sleep(backoffMs); false }
              catch { case _: InterruptedException => true } // stop()
            if (!interrupted) {
              backoffMs = math.min(backoffMs * 2, 30000L)
              try { client = connect(); reconnected += 1 }
              catch { case _: Exception => () } // next pass retries
            }
          }
        case _: Throwable if !running => ()
      }
    }
  }, "graft-nats-subscriber")
  thread.setDaemon(true)

  def messageCount: Long = messages
  def failureCount: Long = failures
  def reconnectCount: Long = reconnected
  override def deliveredCount: Long = messages
  override def healthFailures: Long = failures
  override def healthReconnects: Long = reconnected
  /** The exception that killed the spool thread, if any — None while
    * healthy or after a clean stop().
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

object NatsSubscriber {
  def start(host: String, port: Int, subject: String, spoolDir: String,
      queueGroup: Option[String] = None,
      username: Option[String] = None, password: Option[String] = None,
      token: Option[String] = None, timeoutMs: Int = 2000,
      maxReconnects: Int = 8): NatsSubscriber = {
    def connect(): NatsClient = {
      val c = new NatsClient(host, port, username, password, token, timeoutMs)
      c.subscribe(subject, sid = "1", queueGroup = queueGroup)
      c
    }
    // first connect in the caller's thread: bad config fails fast
    val s = new NatsSubscriber(() => connect(), connect(), spoolDir,
      timeoutMs, maxReconnects)
    s.thread.start()
    s
  }
}

/** Registry-facing NATS connector: reads come off the subscriber's
  * landing directory; write publishes each row's JSON to the subject
  * through per-partition connections in bounded flush chunks, each
  * chunk sealed by the PING barrier.
  */
final case class NatsConnector(
    name: String,
    host: String,
    port: Int,
    subject: String,
    spoolDir: String,
    username: Option[String] = None,
    password: Option[String] = None,
    token: Option[String] = None,
    batchSize: Int = 1000,
    timeoutMs: Int = 5000) extends Connector {

  /** Re-aim at another subject; the landing dir becomes the
    * per-subject subdir `spoolDir/target` (see
    * KafkaConnector.withTarget).
    */
  override def withTarget(target: String): Connector =
    copy(subject = target, spoolDir =
      s"$spoolDir/${target.replaceAll("[^A-Za-z0-9._-]", "_")}")

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(spoolDir)
  }

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(spoolDir)

  override def write(df: DataFrame): Unit = {
    val (h, p, subj, chunk, to) = (host, port, subject, batchSize, timeoutMs)
    val (u, pw, tk) = (username, password, token)
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val client = new NatsClient(h, p, u, pw, tk, to)
        try it.grouped(chunk).foreach(rows => client.publishAll(subj, rows))
        finally client.close()
      }
    }
  }
}
