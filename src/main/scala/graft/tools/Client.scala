package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Client-side CLI twins of the reference's remote-management
  * commands (varpulis-cli/src/main.rs:225-310 arg surface,
  * main.rs:615-848 handlers): thin HTTP wrappers over the
  * [[graft.server.PipelineServer]] API.
  *
  * Usage:
  *   runMain graft.tools.Client <command> [options]
  *     deploy    --file F [--name N]   POST /api/v1/pipelines
  *     pipelines                       GET  /api/v1/pipelines
  *     status                          GET  /api/v1/usage
  *     undeploy  --pipeline-id ID      DELETE /api/v1/pipelines/{id}
  *     logs      --pipeline-id ID      GET  /{id}/logs (SSE follow;
  *               [--max-events N]      stop after N events — scripting)
  *     init      [--server U] [--api-key K]  write .graft.toml
  *     check     --file F              local syntax check (no server)
  *
  * Connection options for every remote command:
  *   --server URL   (or env GRAFT_SERVER, or .graft.toml [remote] url
  *                   — the reference's VARPULIS_SERVER/.varpulis.toml
  *                   resolution order: flag, env, project file)
  *   --api-key K    (or env GRAFT_API_KEY, or .graft.toml api_key)
  *   --ca-cert PEM  trust exactly this certificate for https servers
  *                  (self-signed deployments — see [[graft.server.Tls]])
  *
  * Exit codes: 0 ok, 1 remote/IO failure, 2 usage error. All output
  * goes through the injected stream so ClientSpec can drive every
  * command against a live loopback server.
  */
object Client {

  def main(args: Array[String]): Unit =
    sys.exit(run(args.toSeq, Console.out, Paths.get(".")))

  private val mapper = new ObjectMapper()

  /** Runs one command; returns the process exit code. */
  def run(args: Seq[String], out: java.io.PrintStream, cwd: Path): Int = {
    val (cmd, rest) = args match {
      case head +: tail if !head.startsWith("--") => (head, tail)
      case _ =>
        out.println(usage); return 2
    }
    val opts = parseOpts(rest) match {
      case Right(o) => o
      case Left(bad) =>
        out.println(s"bad argument '$bad'"); out.println(usage); return 2
    }
    try cmd match {
      case "deploy"    => deploy(opts, out, cwd)
      case "pipelines" => pipelines(opts, out, cwd)
      case "status"    => status(opts, out, cwd)
      case "undeploy"  => undeploy(opts, out, cwd)
      case "logs"      => logs(opts, out, cwd)
      case "init"      => init(opts, out, cwd)
      case "check"     => check(opts, out, cwd)
      case "config-gen" => configGen(opts, out, cwd)
      case other =>
        out.println(s"unknown command '$other'"); out.println(usage); 2
    } catch {
      case e: java.net.ConnectException =>
        out.println(s"Connection failed: ${e.getMessage}"); 1
      case e: java.io.IOException =>
        out.println(s"Request failed: ${e.getMessage}"); 1
    }
  }

  private val usage: String =
    """usage: graft.tools.Client <deploy|pipelines|status|undeploy|logs|init|check> [options]
      |  --server URL --api-key K --ca-cert PEM   (remote commands)
      |  deploy:   --file F [--name N]
      |  undeploy: --pipeline-id ID
      |  logs:     --pipeline-id ID [--max-events N]
      |  init:     [--server URL] [--api-key K]
      |  check:    --file F
      |  config-gen: [--format yaml|toml] [--output F]""".stripMargin

  private def parseOpts(rest: Seq[String])
      : Either[String, Map[String, String]] = {
    @annotation.tailrec
    def go(r: List[String], acc: Map[String, String])
        : Either[String, Map[String, String]] = r match {
      case Nil => Right(acc)
      case flag :: v :: tail if flag.startsWith("--") && !v.startsWith("--") =>
        go(tail, acc + (flag.drop(2) -> v))
      case other :: _ => Left(other)
    }
    go(rest.toList, Map.empty)
  }

  // ------------------------------------------------------------------
  // connection resolution (main.rs resolve_url/resolve_api_key:
  // flag > env > project .toml)
  // ------------------------------------------------------------------

  /** `[section] key = "value"` lines of a minimal TOML (the shape
    * `init` writes — the reference's .varpulis.toml). Comments and
    * unquoted values are tolerated; nothing else is needed.
    */
  private[tools] def parseToml(text: String): Map[(String, String), String] = {
    var section = ""
    val out = Map.newBuilder[(String, String), String]
    text.linesIterator.map(_.trim).filter(l =>
        l.nonEmpty && !l.startsWith("#")).foreach { line =>
      if (line.startsWith("[") && line.endsWith("]"))
        section = line.substring(1, line.length - 1).trim
      else line.indexOf('=') match {
        case -1 => ()
        case i =>
          val k = line.take(i).trim
          val v = line.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
          out += ((section, k) -> v)
      }
    }
    out.result()
  }

  private def projectConf(cwd: Path): Map[(String, String), String] = {
    val f = cwd.resolve(".graft.toml")
    if (Files.exists(f))
      parseToml(new String(Files.readAllBytes(f), "UTF-8"))
    else Map.empty
  }

  private final case class Conn(server: String, apiKey: Option[String],
      http: HttpClient)

  private def connect(opts: Map[String, String], out: java.io.PrintStream,
      cwd: Path): Either[Int, Conn] = {
    val conf = projectConf(cwd)
    val server = opts.get("server")
      .orElse(sys.env.get("GRAFT_SERVER"))
      .orElse(conf.get(("remote", "url")))
    val apiKey = opts.get("api-key")
      .orElse(sys.env.get("GRAFT_API_KEY"))
      .orElse(conf.get(("remote", "api_key")))
    server match {
      case None =>
        out.println(
          "No server URL. Use --server, GRAFT_SERVER env, or .graft.toml")
        Left(2)
      case Some(url) =>
        val b = HttpClient.newBuilder()
        opts.get("ca-cert").foreach(pem =>
          b.sslContext(graft.server.Tls.clientContext(pem)))
        Right(Conn(url.stripSuffix("/"), apiKey, b.build()))
    }
  }

  private def send(c: Conn, method: String, path: String,
      body: String = ""): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(c.server + path))
    c.apiKey.foreach(k => b.header("x-api-key", k))
    val r = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }
    c.http.send(r.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Decode the shared ApiError {error, code} envelope for display. */
  private def apiError(resp: HttpResponse[String]): String = {
    val parsed = Try(mapper.readTree(resp.body())).toOption
      .filter(n => n != null && n.hasNonNull("error"))
    parsed match {
      case Some(n) =>
        val code = if (n.hasNonNull("code")) n.get("code").asText() else "?"
        s"${resp.statusCode()} $code: ${n.get("error").asText()}"
      case None => s"${resp.statusCode()}: ${resp.body()}"
    }
  }

  // ------------------------------------------------------------------
  // commands
  // ------------------------------------------------------------------

  private def deploy(opts: Map[String, String], out: java.io.PrintStream,
      cwd: Path): Int = {
    val file = opts.get("file") match {
      case Some(f) => f
      case None => out.println("deploy needs --file"); return 2
    }
    val path = cwd.resolve(file)
    if (!Files.exists(path)) {
      out.println(s"no such file: $file"); return 1
    }
    // name default chain: --name > .graft.toml [deploy].name > stem
    val name = opts.get("name")
      .orElse(projectConf(cwd).get(("deploy", "name")))
      .getOrElse {
        val base = path.getFileName.toString
        if (base.contains('.')) base.substring(0, base.lastIndexOf('.'))
        else base
      }
    connect(opts, out, cwd) match {
      case Left(rc) => rc
      case Right(c) =>
        val req = mapper.createObjectNode()
        req.put("name", name)
        req.put("source", new String(Files.readAllBytes(path), "UTF-8"))
        val resp = send(c, "POST", "/api/v1/pipelines",
          mapper.writeValueAsString(req))
        if (resp.statusCode() == 201) {
          val n = mapper.readTree(resp.body())
          out.println("Pipeline deployed successfully!")
          out.println(s"  ID:     ${n.get("id").asText()}")
          out.println(s"  Name:   ${n.get("name").asText()}")
          out.println(s"  Status: ${n.get("status").asText()}")
          0
        } else { out.println(s"Deploy failed: ${apiError(resp)}"); 1 }
    }
  }

  private def pipelines(opts: Map[String, String],
      out: java.io.PrintStream, cwd: Path): Int =
    connect(opts, out, cwd) match {
      case Left(rc) => rc
      case Right(c) =>
        val resp = send(c, "GET", "/api/v1/pipelines")
        if (resp.statusCode() == 200) {
          val n = mapper.readTree(resp.body())
          out.println(s"Pipelines (${n.get("total").asInt()} total):")
          val ps = n.get("pipelines")
          if (ps.size() == 0) out.println("  (none)")
          ps.elements().forEachRemaining { p =>
            out.println(s"  ${p.get("id").asText()} | " +
              s"${p.get("name").asText()} | ${p.get("status").asText()}")
          }
          0
        } else {
          out.println(s"Failed to list pipelines: ${apiError(resp)}"); 1
        }
    }

  private def status(opts: Map[String, String], out: java.io.PrintStream,
      cwd: Path): Int =
    connect(opts, out, cwd) match {
      case Left(rc) => rc
      case Right(c) =>
        val resp = send(c, "GET", "/api/v1/usage")
        if (resp.statusCode() == 200) {
          val u = mapper.readTree(resp.body())
          val q = u.get("quota")
          out.println(s"Tenant: ${u.get("tenant_id").asText()}")
          out.println(s"  Events processed:  " +
            u.get("events_processed").asLong())
          out.println(s"  Output events emitted: " +
            u.get("output_events_emitted").asLong())
          out.println(s"  Active pipelines:  " +
            u.get("active_pipelines").asInt())
          out.println("  Quota:")
          out.println(s"    Max pipelines:          " +
            q.get("max_pipelines").asInt())
          out.println(s"    Max events/sec:         " +
            q.get("max_events_per_second").asLong())
          out.println(s"    Max streams/pipeline:   " +
            q.get("max_streams_per_pipeline").asInt())
          0
        } else { out.println(s"Failed to get status: ${apiError(resp)}"); 1 }
    }

  private def undeploy(opts: Map[String, String],
      out: java.io.PrintStream, cwd: Path): Int = {
    val id = opts.get("pipeline-id") match {
      case Some(v) => v
      case None => out.println("undeploy needs --pipeline-id"); return 2
    }
    connect(opts, out, cwd) match {
      case Left(rc) => rc
      case Right(c) =>
        val resp = send(c, "DELETE", s"/api/v1/pipelines/$id")
        if (resp.statusCode() == 200) {
          out.println(s"Pipeline $id deleted."); 0
        } else { out.println(s"Undeploy failed: ${apiError(resp)}"); 1 }
    }
  }

  /** SSE follow of /{id}/logs — prints each `data:` event as
    * `[timestamp] EventType {fields}` like the reference's pretty
    * printer. `--max-events N` ends the follow after N events (the
    * reference runs until Ctrl+C; a bounded variant makes the command
    * usable from scripts and tests).
    */
  private def logs(opts: Map[String, String], out: java.io.PrintStream,
      cwd: Path): Int = {
    val id = opts.get("pipeline-id") match {
      case Some(v) => v
      case None => out.println("logs needs --pipeline-id"); return 2
    }
    val maxEvents = opts.get("max-events").flatMap(v =>
      Try(v.toInt).toOption).getOrElse(Int.MaxValue)
    connect(opts, out, cwd) match {
      case Left(rc) => rc
      case Right(c) =>
        val b = HttpRequest.newBuilder(
          URI.create(s"${c.server}/api/v1/pipelines/$id/logs")).GET()
        c.apiKey.foreach(k => b.header("x-api-key", k))
        val resp = c.http.send(b.build(),
          HttpResponse.BodyHandlers.ofInputStream())
        if (resp.statusCode() != 200) {
          out.println(s"Failed to connect to log stream " +
            s"(${resp.statusCode()})")
          return 1
        }
        out.println(s"Streaming logs for pipeline $id...")
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(resp.body(), "UTF-8"))
        var seen = 0
        var line = reader.readLine()
        while (line != null && seen < maxEvents) {
          if (line.startsWith("data:")) {
            val data = line.drop(5).trim
            Try(mapper.readTree(data)).toOption match {
              case Some(n) if n.hasNonNull("event_type") =>
                val ts = if (n.hasNonNull("timestamp"))
                  n.get("timestamp").asText() else "?"
                val fields = Option(n.get("data")).map(_.toString)
                  .getOrElse("")
                out.println(s"[$ts] ${n.get("event_type").asText()} $fields")
              case _ => out.println(data)
            }
            seen += 1
          }
          line = if (seen < maxEvents) reader.readLine() else null
        }
        Try(reader.close())
        0
    }
  }

  /** Write a `.graft.toml` project file (main.rs Commands::Init —
    * refuses to overwrite an existing one).
    */
  private def init(opts: Map[String, String], out: java.io.PrintStream,
      cwd: Path): Int = {
    val path = cwd.resolve(".graft.toml")
    if (Files.exists(path)) {
      out.println(".graft.toml already exists in current directory"); return 1
    }
    // the values land inside quoted TOML strings — a newline or quote
    // would silently truncate the credential at parse time; fail at
    // init instead
    for (v <- opts.get("server").toSeq ++ opts.get("api-key"))
      if (v.exists(c => c == '"' || c == '\n' || c == '\r')) {
        out.println("server/api-key values must not contain quotes " +
          "or newlines")
        return 2
      }
    val sb = new StringBuilder("# graft project configuration\n\n[remote]\n")
    sb ++= s"""url = "${opts.getOrElse("server", "http://localhost:3000")}"\n"""
    opts.get("api-key") match {
      case Some(k) => sb ++= s"""api_key = "$k"\n"""
      case None    => sb ++= "# api_key = \"your-api-key-here\"\n"
    }
    sb ++= "\n[deploy]\n# name = \"my-pipeline\"\n"
    Files.write(path, sb.toString.getBytes("UTF-8"))
    out.println(s"Created $path")
    0
  }

  /** Example server-configuration template (main.rs
    * Commands::ConfigGen, config.rs Config::example — the same
    * section vocabulary rendered for graft's surfaces): yaml or toml
    * to stdout or `--output F`. Unsupported formats error like the
    * reference.
    */
  private def configGen(opts: Map[String, String],
      out: java.io.PrintStream, cwd: Path): Int = {
    val sections: Seq[(String, Seq[(String, String)])] = Seq(
      "server" -> Seq("port" -> "3000", "bind" -> "\"127.0.0.1\"",
        "metrics_enabled" -> "true", "metrics_port" -> "9090",
        "workdir" -> "\".\""),
      "kafka" -> Seq("bootstrap_servers" -> "\"kafka:9092\"",
        "consumer_group" -> "\"graft-consumer\"",
        "input_topic" -> "\"events\"", "output_topic" -> "\"alerts\""),
      "http_webhook" -> Seq("enabled" -> "true", "port" -> "8080",
        "bind" -> "\"127.0.0.1\"", "api_key" -> "\"your-api-key-here\"",
        "rate_limit" -> "1000", "max_batch_size" -> "100"),
      "logging" -> Seq("level" -> "\"info\"", "format" -> "\"json\"",
        "timestamps" -> "true"),
      "processing" -> Seq("workers" -> "4",
        "partition_by" -> "\"source_id\""),
      "tls" -> Seq("cert" -> "\"/path/to/cert.pem\"",
        "key" -> "\"/path/to/key.pem\""),
      "auth" -> Seq("api_key" -> "\"your-websocket-api-key\""))
    val content = opts.getOrElse("format", "yaml").toLowerCase match {
      case "yaml" | "yml" =>
        sections.map { case (name, kvs) =>
          s"$name:\n" + kvs.map { case (k, v) =>
            s"  $k: ${v.stripPrefix("\"").stripSuffix("\"")}"
          }.mkString("\n")
        }.mkString("# graft server configuration\n", "\n", "\n")
      case "toml" =>
        sections.map { case (name, kvs) =>
          s"[$name]\n" + kvs.map { case (k, v) => s"$k = $v" }.mkString("\n")
        }.mkString("# graft server configuration\n", "\n\n", "\n")
      case other =>
        out.println(s"Unsupported format: $other. Use 'yaml' or 'toml'")
        return 2
    }
    opts.get("output") match {
      case Some(f) =>
        val p = cwd.resolve(f)
        Files.write(p, content.getBytes("UTF-8"))
        out.println(s"Configuration written to: $p")
      case None => out.print(content)
    }
    0
  }

  /** Local syntax check (main.rs Commands::Check) — parses the file
    * with the VPL front-end, no server involved.
    */
  private def check(opts: Map[String, String],
      out: java.io.PrintStream, cwd: Path): Int = {
    val file = opts.get("file") match {
      case Some(f) => f
      case None => out.println("check needs --file"); return 2
    }
    val src = Try(new String(
      Files.readAllBytes(cwd.resolve(file)), "UTF-8"))
    src match {
      case scala.util.Failure(e) =>
        out.println(s"cannot read $file: ${e.getMessage}"); 1
      case scala.util.Success(text) =>
        try {
          val prog = graft.vpl.VplParser.parse(text)
          out.println(s"Syntax OK: ${prog.streams.size} stream(s), " +
            s"${prog.events.size} event type(s)")
          0
        } catch {
          case e: graft.vpl.VplParser.VplParseError =>
            out.println(s"Syntax error: ${e.getMessage}"); 1
        }
    }
  }
}
