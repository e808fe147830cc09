package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, EOFException}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.util.concurrent.ConcurrentHashMap

import graft.sources.Resp

/** Loopback RESP2 server FIXTURE for RedisConnectorSpec — the
  * counterpart of HttpConnectorSpec's JDK-HttpServer webhook: it
  * implements the documented Redis wire protocol (RESP2 framing;
  * PING / SET / GET / PUBLISH / SUBSCRIBE command semantics) far
  * enough that the PRODUCT-side client, subscriber, and sink are
  * exercised over real TCP sockets with real protocol framing. Test
  * scope only; the product never depends on it.
  */
final class MiniRedisServer(bindPort: Int = 0) {
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

  private val kv = new ConcurrentHashMap[String, String]()
  // channel -> live subscriber output streams (writes synchronized
  // per-stream so concurrent PUBLISHes can't interleave a frame)
  private val subs =
    new ConcurrentHashMap[String, java.util.List[BufferedOutputStream]]()
  @volatile private var running = true

  private def bulk(s: String): Array[Byte] =
    (s"$$${s.getBytes("UTF-8").length}\r\n$s\r\n").getBytes("UTF-8")

  private def pushMessage(out: BufferedOutputStream, channel: String,
      payload: String): Unit = out.synchronized {
    out.write(s"*3\r\n".getBytes("UTF-8"))
    out.write(bulk("message")); out.write(bulk(channel)); out.write(bulk(payload))
    out.flush()
  }

  /** Push raw bytes onto every subscriber of `channel` — the
    * malformed-frame fault MalformedFrameSpec injects (a RESP bulk
    * header with a non-numeric length → NumberFormatException).
    */
  def injectRaw(channel: String, bytes: Array[Byte]): Unit =
    Option(subs.get(channel)).foreach(_.forEach(o =>
      o.synchronized { o.write(bytes); o.flush() }))

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new BufferedOutputStream(sock.getOutputStream)
    def reply(s: String): Unit =
      out.synchronized { out.write(s.getBytes("UTF-8")); out.flush() }
    try {
      while (running) Resp.read(in) match {
        case Resp.RArr(items) =>
          val args = items.collect { case Resp.RBulk(Some(s)) => s }
          args.map(_.toUpperCase).headOption match {
            case Some("PING") => reply("+PONG\r\n")
            case Some("SET") if args.length == 3 =>
              kv.put(args(1), args(2)); reply("+OK\r\n")
            case Some("GET") if args.length == 2 =>
              Option(kv.get(args(1))) match {
                case Some(v) => out.synchronized {
                  out.write(bulk(v)); out.flush()
                }
                case None => reply("$-1\r\n")
              }
            case Some("PUBLISH") if args.length == 3 =>
              val receivers = Option(subs.get(args(1)))
                .map { l =>
                  l.forEach(o =>
                    // a subscriber that dropped (e.g. after an injected
                    // fault) must not break delivery to the live ones
                    try pushMessage(o, args(1), args(2))
                    catch { case _: java.io.IOException => l.remove(o) })
                  l.size
                }
                .getOrElse(0)
              reply(s":$receivers\r\n")
            case Some("SUBSCRIBE") if args.length == 2 =>
              subs.computeIfAbsent(args(1),
                _ => new java.util.concurrent.CopyOnWriteArrayList[BufferedOutputStream]())
                .add(out)
              out.synchronized {
                out.write("*3\r\n".getBytes("UTF-8"))
                out.write(bulk("subscribe")); out.write(bulk(args(1)))
                out.write(":1\r\n".getBytes("UTF-8"))
                out.flush()
              }
            case _ => reply("-ERR unknown command\r\n")
          }
        case _ => reply("-ERR expected command array\r\n")
      }
    } catch {
      case _: EOFException | _: java.io.IOException => // client closed
    } finally {
      subs.values.forEach(_.remove(out))
      sock.close()
    }
  }

  private val acceptor = new Thread(() => {
    try while (running) {
      val sock = server.accept()
      conns.add(sock)
      val t = new Thread(() => handle(sock), "mini-redis-conn")
      t.setDaemon(true); t.start()
    } catch { case _: java.io.IOException => /* server closed */ }
  }, "mini-redis-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = {
    running = false; server.close()
    conns.forEach(s => try s.close() catch { case _: Exception => () })
  }
}
