package graft.metrics

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal Prometheus scrape endpoint over a [[GraftMetrics]]
  * registry — the transport half of the reference's metrics surface
  * (crates/varpulis-runtime/src/metrics.rs:142+ MetricsServer serves
  * the registry's text encoding over its REST API). JDK-built-in
  * HttpServer, zero new dependencies; GET /metrics returns
  * [[GraftMetrics.gather]] (version 0.0.4 text exposition), anything
  * else 404. Port 0 binds an ephemeral port (tests); [[port]] reports
  * the bound one.
  *
  * One scrape = one listener-bus drain + counter render on the
  * default executor — fine at Prometheus scrape cadence (seconds);
  * this is an observability sidecar, not a data-plane component.
  */
final class MetricsServer private (m: GraftMetrics, bind: InetSocketAddress) {

  System.setProperty("sun.net.httpserver.nodelay", "true") // no Nagle+delayed-ACK stalls
  private val server: HttpServer = HttpServer.create(bind, 0)
  // JDK HttpServer routes by longest matching context PREFIX, so the
  // /metrics context also receives /metricsfoo — check the exact path
  // in the handler; the root context then only ever sees true misses.
  server.createContext("/metrics", new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      val (code, body) =
        if (x.getRequestURI.getPath != "/metrics")
          (404, "not found; scrape /metrics\n")
        else if (x.getRequestMethod == "GET") (200, m.gather())
        else (405, "method not allowed\n")
      respond(x, code, body)
    }
  })
  server.createContext("/", new HttpHandler {
    override def handle(x: HttpExchange): Unit =
      respond(x, 404, "not found; scrape /metrics\n")
  })
  server.start()

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    x.getResponseHeaders.add("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** The actually-bound port (differs from the requested one when 0). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object MetricsServer {
  /** Serve `m` on 127.0.0.1:`port` (0 = ephemeral). */
  def start(m: GraftMetrics, port: Int = 9464): MetricsServer =
    new MetricsServer(m, new InetSocketAddress("127.0.0.1", port))
}
