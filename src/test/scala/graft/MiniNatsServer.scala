package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import graft.sources.NatsProto

/** Loopback NATS server FIXTURE for NatsConnectorSpec — implements
  * the documented client protocol (INFO/CONNECT/SUB/PUB/MSG/PING/
  * PONG, docs.nats.io) far enough to exercise the product client
  * over real TCP, including the two NATS-specific behaviors worth
  * pinning: CONNECT auth (-ERR on bad token/credentials) and QUEUE
  * GROUPS (each message goes to every plain subscriber but exactly
  * ONE member per group, round-robin here for determinism). Test
  * scope only.
  */
final class MiniNatsServer(requireToken: Option[String] = None,
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

  private final case class Sub(out: BufferedOutputStream, subject: String,
    sid: String, queue: Option[String])
  private val subs = new java.util.concurrent.CopyOnWriteArrayList[Sub]()
  private val rr = new AtomicLong(0)
  @volatile private var running = true

  private def deliver(subject: String, payload: String): Unit = {
    val matching = {
      val b = Seq.newBuilder[Sub]
      subs.forEach(s => if (s.subject == subject) b += s)
      b.result()
    }
    val (grouped, plain) = matching.partition(_.queue.isDefined)
    val perGroup = grouped.groupBy(_.queue.get).values.map { members =>
      members((rr.getAndIncrement() % members.length).toInt)
    }
    (plain ++ perGroup).foreach { s =>
      try s.out.synchronized {
        val p = payload.getBytes(UTF_8)
        s.out.write(s"MSG $subject ${s.sid} ${p.length}\r\n".getBytes(UTF_8))
        s.out.write(p); s.out.write("\r\n".getBytes(UTF_8))
        s.out.flush()
      } catch {
        // a subscriber that dropped (e.g. after an injected fault)
        // must not break delivery to the live ones
        case _: java.io.IOException => subs.remove(s)
      }
    }
  }

  /** Push raw bytes onto every live subscriber connection — the
    * malformed-frame fault MalformedFrameSpec injects (a MSG header
    * with a non-numeric payload size → NumberFormatException).
    */
  def injectRaw(bytes: Array[Byte]): Unit =
    subs.forEach(s => s.out.synchronized { s.out.write(bytes); s.out.flush() })

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new BufferedOutputStream(sock.getOutputStream)
    def send(s: String): Unit =
      out.synchronized { out.write(s.getBytes(UTF_8)); out.flush() }
    var authed = requireToken.isEmpty
    try {
      send(s"""INFO {"server_id":"mini","version":"fixture"}""" + "\r\n")
      while (running) {
        val line = NatsProto.readLine(in)
        val upper = line.toUpperCase
        if (upper.startsWith("CONNECT")) {
          authed = requireToken.forall(t =>
            line.contains(s""""auth_token":"$t""""))
          // non-verbose: no +OK; a failed auth surfaces on first PING
        } else if (upper == "PING") {
          if (authed) send("PONG\r\n")
          else { send("-ERR 'Authorization Violation'\r\n"); return }
        } else if (upper == "PONG") {
          // client answering our (never-sent) PING — ignore
        } else if (upper.startsWith("SUB ")) {
          val parts = line.split(" ")
          if (parts.length == 3) subs.add(Sub(out, parts(1), parts(2), None))
          else subs.add(Sub(out, parts(1), parts(3), Some(parts(2))))
        } else if (upper.startsWith("PUB ")) {
          val parts = line.split(" ")
          val payload = NatsProto.readPayload(in, parts.last.toInt)
          if (authed) deliver(parts(1), payload)
        } else send("-ERR 'Unknown Protocol Operation'\r\n")
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
      val t = new Thread(() => handle(sock), "mini-nats-conn")
      t.setDaemon(true); t.start()
    } catch { case _: java.io.IOException => /* server closed */ }
  }, "mini-nats-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false; server.close()
    conns.forEach(s => try s.close() catch { case _: Exception => () })
  }
}
