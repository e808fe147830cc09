package graft.tools

import org.apache.spark.sql.SparkSession

import graft.server.PipelineServer

/** CLI twin of `varpulis server` (varpulis-cli main; the API surface
  * is [[graft.server.PipelineServer]]): start the pipeline-management
  * HTTP server and serve until killed. Pairs with
  * [[graft.metrics.MetricsServer]] for the Prometheus scrape side.
  *
  * Usage:
  *   runMain graft.tools.Serve [options]
  *     --port N        bind port (default 3000, the reference's)
  *     --api-key K     require x-api-key K on /api/v1 routes
  *     --rate-limit R  throttle /api/v1 to R requests/s per client
  *                     (token bucket, burst 2R — reference rate_limit.rs)
  *     --ws-port N     also serve ws://127.0.0.1:N/ws (the reference
  *                     co-hosts /ws on the REST port; graft's JDK
  *                     HttpServer cannot hijack an upgrade, so the ws
  *                     transport gets its own listener — same
  *                     WsMessage vocabulary, same x-api-key)
  *     --workdir D     load_file root for the ws transport (default .)
  *     --master M      Spark master (default local[*])
  *     --tls-cert F    PEM certificate; with --tls-key switches the
  *                     API listener to HTTPS and the ws listener to
  *                     WSS (main.rs --tls-cert/--tls-key; also env
  *                     GRAFT_TLS_CERT / GRAFT_TLS_KEY, the
  *                     VARPULIS_TLS_* twins)
  *     --tls-key F     PEM private key (PKCS#8 or PKCS#1)
  */
object Serve {
  def main(args: Array[String]): Unit = {
    def parse(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case flag :: v :: tail if flag.startsWith("--") && !v.startsWith("--") =>
          parse(tail, acc + (flag.drop(2) -> v))
        case other :: _ =>
          System.err.println(s"bad argument '$other' — usage: " +
            "[--port N] [--api-key K] [--rate-limit R] [--ws-port N] " +
            "[--workdir D] [--master M] [--tls-cert F --tls-key F]")
          sys.exit(2)
      }
    val opts = parse(args.toList, Map.empty)
    val tls = (opts.get("tls-cert").orElse(sys.env.get("GRAFT_TLS_CERT")),
      opts.get("tls-key").orElse(sys.env.get("GRAFT_TLS_KEY"))) match {
      case (Some(c), Some(k)) => Some((c, k))
      case (None, None)       => None
      case _ =>
        System.err.println(
          "--tls-cert and --tls-key must be provided together")
        sys.exit(2)
    }
    val b = SparkSession.builder()
      .master(opts.getOrElse("master",
        sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]")))
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val srv = PipelineServer.start(spark,
      port = opts.get("port").map(_.toInt).getOrElse(3000),
      apiKey = opts.get("api-key"),
      requestsPerSecond = opts.get("rate-limit").map(_.toInt),
      tlsCertKey = tls)
    println(s"[serve] pipeline API on ${srv.scheme}://127.0.0.1:${srv.port} " +
      s"(auth: ${if (opts.contains("api-key")) "x-api-key" else "open"}, " +
      s"throttle: ${opts.getOrElse("rate-limit", "off")})")
    val ws = opts.get("ws-port").map { p =>
      val w = graft.server.WsServer.start(spark, port = p.toInt,
        apiKey = opts.get("api-key"),
        workdir = new java.io.File(opts.getOrElse("workdir", ".")),
        tlsCertKey = tls)
      println(s"[serve] ws transport on ${w.scheme}://127.0.0.1:${w.port}/ws")
      w
    }
    sys.addShutdownHook { ws.foreach(_.stop()); srv.stop(); spark.stop() }
    Thread.currentThread.join() // serve until killed
  }
}
