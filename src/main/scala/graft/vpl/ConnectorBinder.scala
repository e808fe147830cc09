package graft.vpl

import graft.sources._
import VplAst._

/** Builds REAL connector instances from a VPL program's top-of-file
  * `connector X = kafka(...)` declarations (reference: docs/language/
  * connectors.md; the kafka benchmark programs declare exactly this,
  * benchmarks/connector-comparison/varpulis/kafka/01_filter.vpl:1).
  * Every bundled transport binds: kafka/mqtt/nats/redis (the wire-
  * protocol clients), elasticsearch (bulk sink + sliced-scroll read),
  * http (webhook landing dir + POST sink), database (JDBC), file.
  * Unknown types are SKIPPED — the compiler's unbound-connector
  * degradation (no-op sinks, fallback enrichment) keeps such programs
  * compiling, matching the reference's feature-gated stubs.
  *
  * Param conventions follow the reference configs: `brokers`
  * ("host:port[,...]" — first entry wins; multi-broker leader routing
  * is spark-sql-kafka's job), `broker`/`server`/`host` + `port`,
  * `topic`/`subject`/`channel`/`index`/`table`, `username`/`password`
  * /`token`/`api_key`, `url`, `path`/`format`. `spool_dir` (or the
  * supplied default) is where the driver-side subscriber/poller for
  * that transport lands NDJSON — binding constructs connectors, it
  * does NOT start pollers (lifecycle belongs to the caller; a
  * constructed binder never needs a live broker).
  */
object ConnectorBinder {

  private def str(params: Seq[(String, VExpr)], key: String): Option[String] =
    params.collectFirst {
      case (k, VStr(v)) if k == key  => v
      case (k, VInt(v)) if k == key  => v.toString
      case (k, VNum(v)) if k == key  => v.toString
      case (k, VBool(v)) if k == key => v.toString
    }
  private def int(params: Seq[(String, VExpr)], key: String): Option[Int] =
    params.collectFirst { case (k, VInt(v)) if k == key => v.toInt }

  /** ("host", port) from `brokers: "h:p,..."` or host/port params. */
  private def hostPort(params: Seq[(String, VExpr)],
      hostKeys: Seq[String], defaultPort: Int): (String, Int) = {
    str(params, "brokers").orElse(str(params, "servers")) match {
      case Some(bs) =>
        val first = bs.split(",").head.trim
        first.split(":") match {
          case Array(h, p) => (h, p.toInt)
          case Array(h)    => (h, defaultPort)
          case _           => ("127.0.0.1", defaultPort)
        }
      case None =>
        val h = hostKeys.flatMap(k => str(params, k)).headOption
          .getOrElse("127.0.0.1")
        // `broker: "host:port"` single-string spelling
        if (h.contains(":")) {
          val Array(hh, pp) = h.split(":", 2)
          (hh, pp.toInt)
        } else (h, int(params, "port").getOrElse(defaultPort))
    }
  }

  private def tempSpool(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_vpl_${name}_").toString

  /** One connector from one declaration; None when the type has no
    * bundled binding.
    */
  def bindOne(decl: VConnector): Option[Connector] = {
    val p = decl.params
    val spool = str(p, "spool_dir").getOrElse(tempSpool(decl.name))
    decl.ctype match {
      case "kafka" =>
        val (h, port) = hostPort(p, Seq("host"), 9092)
        Some(KafkaConnector(decl.name, h, port,
          topic = str(p, "topic").getOrElse(decl.name),
          spoolDir = spool,
          username = str(p, "username"), password = str(p, "password"),
          key = str(p, "key"),
          // rdkafka's `compression.type` (kafka.rs:19-56); dots don't
          // parse as param identifiers, so the VPL spellings are
          // `compression:` / `compression_type:`
          compression = str(p, "compression")
            .orElse(str(p, "compression_type")).getOrElse("none")))
      case "mqtt" =>
        val (h, port) = hostPort(p, Seq("broker", "host"), 1883)
        Some(MqttConnector(decl.name, h, port,
          topic = str(p, "topic").getOrElse(decl.name),
          spoolDir = spool,
          clientId = str(p, "client_id"),
          username = str(p, "username"), password = str(p, "password"),
          qos = int(p, "qos").getOrElse(0)))
      case "nats" =>
        val (h, port) = hostPort(p, Seq("server", "host"), 4222)
        Some(NatsConnector(decl.name, h, port,
          subject = str(p, "subject").getOrElse(decl.name),
          spoolDir = spool,
          username = str(p, "username"), password = str(p, "password"),
          token = str(p, "token")))
      case "redis" =>
        val (h, port) = hostPort(p, Seq("host"), 6379)
        Some(RedisConnector(decl.name, h, port,
          channel = str(p, "channel").getOrElse(decl.name),
          spoolDir = spool,
          keyPrefix = str(p, "key_prefix")))
      case "elasticsearch" | "es" =>
        str(p, "url").map(u => EsConnector(decl.name, u,
          index = str(p, "index").getOrElse(decl.name),
          username = str(p, "username"), password = str(p, "password"),
          apiKey = str(p, "api_key")))
      case "http" | "webhook" =>
        Some(HttpConnector(decl.name, spoolDir = spool,
          sinkUrl = str(p, "url").orElse(str(p, "sink_url")).getOrElse(""),
          headers = str(p, "api_key")
            .map(k => Map("x-api-key" -> k)).getOrElse(Map.empty)))
      case "database" | "jdbc" =>
        for (u <- str(p, "url"); t <- str(p, "table"))
          yield JdbcConnector(decl.name, u, t)
      case "file" =>
        str(p, "path").map(path => FileConnector(decl.name, path,
          format = str(p, "format").getOrElse("json")))
      case _ => None // e.g. console/timer — no sink/source binding
    }
  }

  /** Every bindable declaration of a program, keyed by declared name. */
  def bind(program: VProgram): Map[String, Connector] =
    program.connectors.flatMap(c => bindOne(c).map(c.name -> _)).toMap
}
