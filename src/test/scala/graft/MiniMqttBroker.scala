package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.MqttProto

/** Loopback MQTT 3.1.1 broker FIXTURE for MqttConnectorSpec —
  * implements the spec packets the product client speaks
  * (CONNECT/CONNACK with return codes 0/4/5, SUBSCRIBE/SUBACK,
  * PUBLISH routing at QoS 0/1 with PUBACK both directions,
  * PINGREQ/PINGRESP, DISCONNECT) far enough that the client,
  * subscriber and sink are exercised over real TCP with real binary
  * framing. Exact-match topics plus the '#' multi-level wildcard.
  * Test scope only.
  */
final class MiniMqttBroker(
    requireUser: Option[(String, String)] = None,
    bindPort: Int = 0) {

  private val server = new ServerSocket()
  server.setReuseAddress(true) // restart-on-same-port (reconnect tests)
  // a fixed-port restart can race the previous instance's FIN
  // exchange (half-open peers hold the port outside TIME_WAIT);
  // retry briefly, like a real broker restart script would
  locally {
    val deadline = System.nanoTime() + 5000000000L
    var bound = false
    while (!bound) {
      try { server.bind(new InetSocketAddress("127.0.0.1", bindPort)); bound = true }
      catch {
        case e: java.net.BindException =>
          if (bindPort == 0 || System.nanoTime() > deadline) throw e
          Thread.sleep(100)
      }
    }
  }
  def port: Int = server.getLocalPort
  private val conns = new java.util.concurrent.CopyOnWriteArrayList[Socket]()

  private final case class Sub(out: BufferedOutputStream, topic: String,
    qos: Int, shareGroup: Option[String])
  private val subs = new java.util.concurrent.CopyOnWriteArrayList[Sub]()
  private val rr = new java.util.concurrent.atomic.AtomicLong(0)
  @volatile private var running = true
  @volatile var publishesSeen = 0

  private def matches(filter: String, topic: String): Boolean =
    filter == topic ||
      (filter.endsWith("#") && topic.startsWith(filter.dropRight(1)))

  /** `$share/<group>/<filter>` → (Some(group), filter); the de-facto
    * shared-subscription extension 3.1.1 brokers (EMQX, HiveMQ)
    * support and MQTT 5 standardized — each message goes to ONE
    * member per share group (round-robin here for determinism).
    */
  private def parseShare(filter: String): (Option[String], String) =
    if (filter.startsWith("$share/")) {
      val rest = filter.stripPrefix("$share/")
      val slash = rest.indexOf('/')
      if (slash > 0) (Some(rest.take(slash)), rest.drop(slash + 1))
      else (None, filter)
    } else (None, filter)

  private def deliver(topic: String, payload: Array[Byte]): Unit = {
    var pid = 100
    val matching = {
      val b = Seq.newBuilder[Sub]
      subs.forEach(s => if (matches(s.topic, topic)) b += s)
      b.result()
    }
    val (grouped, plain) = matching.partition(_.shareGroup.isDefined)
    val perGroup = grouped.groupBy(_.shareGroup.get).values.map { members =>
      members((rr.getAndIncrement() % members.length).toInt)
    }
    (plain ++ perGroup).foreach { s =>
      try s.out.synchronized {
        pid += 1
        s.out.write(MqttProto.publish(topic, payload, s.qos, pid))
        s.out.flush()
      } catch {
        // a subscriber that dropped (e.g. after an injected fault)
        // must not break delivery to the live ones
        case _: java.io.IOException => subs.remove(s)
      }
    }
  }

  /** Push raw bytes onto every live subscriber connection — the
    * malformed-frame fault MalformedFrameSpec injects (a truncated
    * PUBLISH whose decode throws a NON-IO exception).
    */
  def injectRaw(bytes: Array[Byte]): Unit =
    subs.forEach(s => s.out.synchronized { s.out.write(bytes); s.out.flush() })

  private def parseConnect(body: Array[Byte]): (String, Option[String], Option[String]) = {
    val protoLen = MqttProto.u16(body, 0)
    var off = 2 + protoLen + 1 // name + level
    val flags = body(off) & 0xff
    off += 3 // flags + keepalive
    val cidLen = MqttProto.u16(body, off)
    val cid = new String(body, off + 2, cidLen, UTF_8)
    off += 2 + cidLen
    val user = if ((flags & 0x80) != 0) {
      val n = MqttProto.u16(body, off)
      val u = new String(body, off + 2, n, UTF_8); off += 2 + n; Some(u)
    } else None
    val pass = if ((flags & 0x40) != 0) {
      val n = MqttProto.u16(body, off)
      val p = new String(body, off + 2, n, UTF_8); off += 2 + n; Some(p)
    } else None
    (cid, user, pass)
  }

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new BufferedOutputStream(sock.getOutputStream)
    def send(b: Array[Byte]): Unit =
      out.synchronized { out.write(b); out.flush() }
    try {
      // first packet must be CONNECT
      val (t0, body0) = MqttProto.read(in)
      if ((t0 >> 4) != 1) return
      val (_, user, pass) = parseConnect(body0)
      val rc = requireUser match {
        case Some((u, p)) =>
          if (user.isEmpty) 5 // not authorized
          else if (!user.contains(u) || !pass.contains(p)) 4 // bad creds
          else 0
        case None => 0
      }
      send(MqttProto.packet(0x20, Array(0.toByte, rc.toByte))) // CONNACK
      if (rc != 0) return
      while (running) {
        val (t, body) = MqttProto.read(in)
        (t >> 4) match {
          case 3 => // PUBLISH
            publishesSeen += 1
            val (topic, qos, pid, payload) = MqttProto.parsePublish(t, body)
            deliver(topic, payload)
            if (qos == 1) send(MqttProto.puback(pid))
          case 8 => // SUBSCRIBE
            val pid = MqttProto.u16(body, 0)
            val tlen = MqttProto.u16(body, 2)
            val topic = new String(body, 4, tlen, UTF_8)
            val qos = body(4 + tlen) & 0xff
            val (group, filter) = parseShare(topic)
            subs.add(Sub(out, filter, math.min(qos, 1), group))
            send(MqttProto.packet(0x90,
              Array(((pid >> 8) & 0xff).toByte, (pid & 0xff).toByte,
                math.min(qos, 1).toByte))) // SUBACK
          case 12 => send(MqttProto.pingresp)
          case 4  => () // PUBACK from a QoS-1 subscriber — consumed
          case 14 => return // DISCONNECT
          case _  => return
        }
      }
    } catch {
      case _: EOFException | _: java.io.IOException => // client closed
    } finally {
      subs.removeIf(_.out eq out)
      sock.close()
    }
  }

  private val acceptor = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      conns.add(sock)
      val t = new Thread(() => handle(sock), "mini-mqtt-conn")
      t.setDaemon(true); t.start()
    } catch { case _: java.io.IOException => /* server closed */ }
  }, "mini-mqtt-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false; server.close()
    conns.forEach(s => try s.close() catch { case _: Exception => () })
  }
}
