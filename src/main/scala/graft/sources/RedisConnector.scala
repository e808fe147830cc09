package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL Redis transport for the connector surface (reference
  * connector/redis.rs) — an actual RESP2 wire-protocol client over
  * TCP, zero new dependencies (java.net.Socket), loopback-tested
  * against an in-process RESP server the same way the HTTP connector
  * is tested against a loopback webhook.
  *
  * The reference's Redis connector (redis.rs:42-137 behind the
  * `redis` feature) SUBSCRIBEs to a channel and turns each JSON
  * payload into an event, skipping non-JSON payloads with a warning;
  * its sink PUBLISHes each event's JSON to the channel
  * (redis.rs:197-213), and RedisSink additionally exposes SET/GET
  * with an optional key prefix (redis.rs:14-30,166-194).
  *
  * graft's shape follows the REST-poller precedent: pub/sub delivery
  * is transient (a message published with no subscriber is GONE), so
  * exactly ONE driver-side subscriber holds the SUBSCRIBE connection
  * and spools each JSON payload atomically as NDJSON into a landing
  * directory; Spark's json file source — batch or streaming — reads
  * the landing dir, so a 1000-executor cluster keeps one subscription
  * (Redis pub/sub fan-out is per-connection; a thousand competing
  * subscribers would each get every message) and the file source
  * gives exactly-once delivery downstream. The sink half runs
  * executor-side: one client per partition, commands PIPELINED in
  * bounded chunks (write N commands, then read N replies) so memory
  * stays bounded and round trips amortize — the same
  * bounded-chunk contract as the HTTP sink.
  */
private[graft] object Resp {

  sealed trait Value
  final case class RSimple(s: String) extends Value
  final case class RError(msg: String) extends Value
  final case class RInt(n: Long) extends Value
  /** None = null bulk ($-1). */
  final case class RBulk(s: Option[String]) extends Value
  final case class RArr(items: Seq[Value]) extends Value

  /** A client command is always an array of bulk strings. */
  def encodeCommand(args: Seq[String]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append('*').append(args.length).append("\r\n")
    args.foreach { a =>
      val b = a.getBytes(UTF_8)
      sb.append('$').append(b.length).append("\r\n")
      sb.append(a).append("\r\n")
    }
    sb.toString.getBytes(UTF_8)
  }

  private def readLine(in: DataInputStream): String = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new EOFException("resp: connection closed")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new java.io.IOException("resp: expected \\n")
    sb.toString
  }

  /** One reply (or pub/sub push — same framing). */
  def read(in: DataInputStream): Value = {
    val t = in.read()
    if (t < 0) throw new EOFException("resp: connection closed")
    t.toChar match {
      case '+' => RSimple(readLine(in))
      case '-' => RError(readLine(in))
      case ':' => RInt(readLine(in).toLong)
      case '$' =>
        val n = readLine(in).toInt
        if (n < 0) RBulk(None)
        else {
          val buf = new Array[Byte](n)
          in.readFully(buf)
          if (in.read() != '\r' || in.read() != '\n')
            throw new java.io.IOException("resp: bulk not \\r\\n-terminated")
          RBulk(Some(new String(buf, UTF_8)))
        }
      case '*' =>
        val n = readLine(in).toInt
        RArr((0 until math.max(n, 0)).map(_ => read(in)))
      case other =>
        throw new java.io.IOException(s"resp: unknown type byte '$other'")
    }
  }
}

/** Blocking RESP client over one TCP connection. Not thread-safe —
  * one per thread/partition, like the reference's per-connection
  * manager clones.
  */
final class RedisClient(host: String, port: Int, timeoutMs: Int = 5000)
    extends AutoCloseable {
  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = new BufferedOutputStream(socket.getOutputStream)
  private[sources] val in =
    new DataInputStream(new BufferedInputStream(socket.getInputStream))

  def command(args: String*): Resp.Value = {
    out.write(Resp.encodeCommand(args))
    out.flush()
    Resp.read(in) match {
      case Resp.RError(m) => throw new java.io.IOException(s"redis: $m")
      case v              => v
    }
  }

  /** Pipelined batch: all commands written, then all replies read —
    * one round trip per CHUNK, not per command.
    */
  def pipeline(cmds: Seq[Seq[String]]): Seq[Resp.Value] = {
    cmds.foreach(c => out.write(Resp.encodeCommand(c)))
    out.flush()
    cmds.map { _ =>
      Resp.read(in) match {
        case Resp.RError(m) => throw new java.io.IOException(s"redis: $m")
        case v              => v
      }
    }
  }

  def ping(): Boolean = command("PING") == Resp.RSimple("PONG")
  def set(key: String, value: String): Unit = command("SET", key, value)
  def get(key: String): Option[String] = command("GET", key) match {
    case Resp.RBulk(v) => v
    case other => throw new java.io.IOException(s"redis: GET got $other")
  }
  def publish(channel: String, msg: String): Long =
    command("PUBLISH", channel, msg) match {
      case Resp.RInt(n) => n
      case other => throw new java.io.IOException(s"redis: PUBLISH got $other")
    }

  /** Enter subscribe mode (redis.rs:68-76). After this the connection
    * only receives pushes; read them via [[in]].
    */
  def subscribe(channel: String): Unit = {
    out.write(Resp.encodeCommand(Seq("SUBSCRIBE", channel)))
    out.flush()
    Resp.read(in) match {
      case Resp.RArr(Seq(Resp.RBulk(Some("subscribe")), _, _)) => ()
      case other =>
        throw new java.io.IOException(s"redis: SUBSCRIBE got $other")
    }
  }

  override def close(): Unit = socket.close()
}

/** Driver-side subscriber: one SUBSCRIBE connection, each JSON
  * message spooled atomically as one NDJSON line (non-JSON payloads
  * counted and skipped — the reference warns and continues,
  * redis.rs:100-117). Raw newlines inside accepted JSON collapse to
  * spaces (illegal inside string literals, so lossless — the webhook
  * spool's contract).
  *
  * Spool ceiling, measured on loopback (ConnectorThroughputSpec):
  * ~11k msg/s per subscriber thread. Redis pub/sub is broadcast
  * (every subscriber gets every message), so scaling past the
  * ceiling means sharding across channels, one subscriber each —
  * or Redis Streams consumer groups via a cluster-side binding.
  */
final class RedisSubscriber private (
    host: String, port: Int, channel: String, spoolDir: String,
    timeoutMs: Int, maxReconnects: Int) extends PollerHealth {

  private def connect(): RedisClient = {
    val c = new RedisClient(host, port, timeoutMs)
    c.subscribe(channel)
    c
  }

  // first connect in the caller's thread: bad config fails fast
  @volatile private var client: RedisClient = connect()
  @volatile private var running = true
  @volatile private var messages = 0L
  @volatile private var failures = 0L
  @volatile private var reconnected = 0L
  @volatile private var terminal: Option[Throwable] = None

  private def oneLine(s: String): String = s.replaceAll("[\n\r]+", " ")

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
            Resp.read(client.in) match {
              case Resp.RArr(Seq(Resp.RBulk(Some("message")), _,
                  Resp.RBulk(Some(payload)))) =>
                val t = payload.trim
                if (t.startsWith("{") && t.endsWith("}")) {
                  spool(oneLine(t)); messages += 1
                } else failures += 1
                attempts = 0; backoffMs = 500L
              case _ => () // other pushes (unsubscribe acks) ignored
            }
          } catch {
            case _: java.net.SocketTimeoutException => () // idle; poll running
          }
        }
      } catch {
        // ANY failure while running=true — connection loss (IO) or a
        // NON-IO decode error (malformed RESP length → NumberFormat-
        // Exception) — routes through the same reconnect-then-
        // terminal path: a reconnect resyncs frame boundaries, and a
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
              s"graft-redis-subscriber: terminal after $maxReconnects " +
                s"reconnect attempts: $e")
          } else {
            System.err.println(s"graft-redis-subscriber: connection lost " +
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
  }, s"graft-redis-subscriber-$channel")
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
    client.close() // unblocks the reader
    thread.interrupt() // break a backoff sleep
    thread.join(timeoutMs.toLong * 2)
  }
}

object RedisSubscriber {
  def start(host: String, port: Int, channel: String, spoolDir: String,
      timeoutMs: Int = 2000, maxReconnects: Int = 8): RedisSubscriber = {
    val s = new RedisSubscriber(host, port, channel, spoolDir, timeoutMs,
      maxReconnects)
    s.thread.start()
    s
  }
}

/** Registry-facing Redis connector: reads come off the subscriber's
  * landing directory; write PUBLISHes each row's JSON to the channel
  * through pipelined chunks, one client per partition, executor-side.
  * `set`/`get` expose the reference sink's KV half with its optional
  * key prefix (redis.rs:166-194) — the driver-side lookup shape
  * `.enrich` dimension loads use.
  */
final case class RedisConnector(
    name: String,
    host: String,
    port: Int,
    channel: String,
    spoolDir: String,
    keyPrefix: Option[String] = None,
    batchSize: Int = 1000,
    timeoutMs: Int = 5000) extends Connector {

  /** Re-aim at another channel; the landing dir becomes the
    * per-channel subdir `spoolDir/target` (see
    * KafkaConnector.withTarget).
    */
  override def withTarget(target: String): Connector =
    copy(channel = target, spoolDir =
      s"$spoolDir/${target.replaceAll("[^A-Za-z0-9._-]", "_")}")

  private def fullKey(key: String): String =
    keyPrefix.fold(key)(p => s"$p:$key")

  /** Driver-side KV helpers (fresh bounded-lifetime connection —
    * these are dimension-load conveniences, not a hot path).
    */
  def set(key: String, value: String): Unit = {
    val c = new RedisClient(host, port, timeoutMs)
    try c.set(fullKey(key), value) finally c.close()
  }
  def get(key: String): Option[String] = {
    val c = new RedisClient(host, port, timeoutMs)
    try c.get(fullKey(key)) finally c.close()
  }

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(spoolDir)
  }

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(spoolDir)

  override def write(df: DataFrame): Unit = {
    val (h, p, ch, chunk, to) = (host, port, channel, batchSize, timeoutMs)
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      if (it.hasNext) {
        val client = new RedisClient(h, p, to)
        try it.grouped(chunk).foreach { rows =>
          client.pipeline(rows.map(r => Seq("PUBLISH", ch, r)))
        } finally client.close()
      }
    }
  }
}
