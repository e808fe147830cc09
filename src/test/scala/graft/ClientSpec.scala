package graft

import java.nio.file.Files

import graft.server.PipelineServer
import graft.tools.Client

/** Drives every Client CLI command end-to-end against a live loopback
  * PipelineServer — the reference's remote-management commands
  * (main.rs Deploy/Pipelines/Status/Undeploy/Logs/Init/Check).
  */
class ClientSpec extends SparkSpec {

  private val alertsVpl =
    """event Tick:
      |    symbol: str
      |    price: float
      |
      |stream Alerts = Tick
      |    .where(price > 100.0)
      |    .emit(symbol: symbol, price: price)
      |""".stripMargin

  /** Run a command; returns (exit code, captured stdout). */
  private def run(cwd: java.nio.file.Path, args: String*): (Int, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(buf, true, "UTF-8")
    val rc = Client.run(args.toSeq, ps, cwd)
    (rc, new String(buf.toByteArray, "UTF-8"))
  }

  test("init, deploy, pipelines, status, undeploy against a live server") {
    val srv = PipelineServer.start(spark, apiKey = Some("sekrit"))
    val cwd = Files.createTempDirectory("graft_client_")
    try {
      // init writes the project file; a second init refuses
      val (ic, iOut) = run(cwd, "init",
        "--server", s"http://127.0.0.1:${srv.port}", "--api-key", "sekrit")
      assert(ic == 0 && iOut.contains("Created"), iOut)
      val toml = new String(Files.readAllBytes(
        cwd.resolve(".graft.toml")), "UTF-8")
      assert(toml.contains(s"""url = "http://127.0.0.1:${srv.port}""""), toml)
      assert(toml.contains("""api_key = "sekrit""""), toml)
      val (ic2, iOut2) = run(cwd, "init")
      assert(ic2 == 1 && iOut2.contains("already exists"), iOut2)

      // deploy resolves server+key+name-stem from the project file
      Files.write(cwd.resolve("alerts.vpl"), alertsVpl.getBytes("UTF-8"))
      val (dc, dOut) = run(cwd, "deploy", "--file", "alerts.vpl")
      assert(dc == 0 && dOut.contains("deployed successfully"), dOut)
      assert(dOut.contains("Name:   alerts"), dOut)
      val id = dOut.linesIterator.find(_.contains("ID:"))
        .map(_.split(":").last.trim).get

      val (lc, lOut) = run(cwd, "pipelines")
      assert(lc == 0 && lOut.contains("Pipelines (1 total)"), lOut)
      assert(lOut.contains(s"$id | alerts | running"), lOut)

      val (sc, sOut) = run(cwd, "status")
      assert(sc == 0 && sOut.contains("Tenant: default"), sOut)
      assert(sOut.contains("Max pipelines:          10"), sOut)

      val (uc, uOut) = run(cwd, "undeploy", "--pipeline-id", id)
      assert(uc == 0 && uOut.contains(s"Pipeline $id deleted"), uOut)
      val (lc2, lOut2) = run(cwd, "pipelines")
      assert(lc2 == 0 && lOut2.contains("(none)"), lOut2)

      // flags override the project file: a wrong key decodes the
      // ApiError envelope and exits 1
      val (ec, eOut) = run(cwd, "pipelines", "--api-key", "wrong")
      assert(ec == 1 && eOut.contains("invalid_api_key"), eOut)
      // no resolvable server anywhere → usage error
      val bare = Files.createTempDirectory("graft_client_bare_")
      val (nc, nOut) = run(bare, "status")
      assert(nc == 2 && nOut.contains("No server URL"), nOut)
    } finally srv.stop()
  }

  test("logs follows the SSE stream and pretty-prints events") {
    val srv = PipelineServer.start(spark)
    val cwd = Files.createTempDirectory("graft_client_")
    try {
      Files.write(cwd.resolve("alerts.vpl"), alertsVpl.getBytes("UTF-8"))
      val server = s"http://127.0.0.1:${srv.port}"
      val (_, dOut) = run(cwd, "deploy", "--file", "alerts.vpl",
        "--server", server)
      val id = dOut.linesIterator.find(_.contains("ID:"))
        .map(_.split(":").last.trim).get
      // produce one output event, then follow with --max-events 1 so
      // the command terminates
      val inject = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$server/api/v1/pipelines/$id/events"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"event_type":"Tick","fields":{"symbol":"MSFT","price":150.5}}"""))
        .build()
      java.net.http.HttpClient.newHttpClient().send(inject,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val (gc, gOut) = run(cwd, "logs", "--pipeline-id", id,
        "--server", server, "--max-events", "1")
      assert(gc == 0 && gOut.contains("Streaming logs"), gOut)
      assert(gOut.contains("MSFT"), gOut)
    } finally srv.stop()
  }

  test("remote commands work over HTTPS with --ca-cert; check is local") {
    val srv = PipelineServer.start(spark, tlsCertKey = Some((
      "src/test/resources/tls/cert.pem",
      "src/test/resources/tls/key_pkcs8.pem")))
    val cwd = Files.createTempDirectory("graft_client_")
    try {
      val server = s"https://127.0.0.1:${srv.port}"
      val cert = new java.io.File("src/test/resources/tls/cert.pem")
        .getAbsolutePath
      val (sc, sOut) = run(cwd, "status", "--server", server,
        "--ca-cert", cert)
      assert(sc == 0 && sOut.contains("Tenant: default"), sOut)
      // without the trust anchor the handshake fails → exit 1
      val (fc, fOut) = run(cwd, "status", "--server", server)
      assert(fc == 1, fOut)

      Files.write(cwd.resolve("ok.vpl"), alertsVpl.getBytes("UTF-8"))
      // relative path: check resolves against the project cwd like
      // every other command (not the JVM working directory)
      val (cc, cOut) = run(cwd, "check", "--file", "ok.vpl")
      assert(cc == 0 && cOut.contains("Syntax OK: 1 stream(s)"), cOut)
      Files.write(cwd.resolve("bad.vpl"),
        "stream X = .where(".getBytes("UTF-8"))
      val (bc, bOut) = run(cwd, "check",
        "--file", cwd.resolve("bad.vpl").toString)
      assert(bc == 1 && bOut.contains("Syntax error"), bOut)
    } finally srv.stop()
  }

  test("config-gen renders yaml and toml templates (ConfigGen twin)") {
    val cwd = Files.createTempDirectory("graft_client_")
    val (yc, yOut) = run(cwd, "config-gen")
    assert(yc == 0 && yOut.contains("server:") &&
      yOut.contains("metrics_port: 9090"), yOut)
    val (tc, tOut) = run(cwd, "config-gen", "--format", "toml",
      "--output", "graft.toml")
    assert(tc == 0 && tOut.contains("Configuration written to"), tOut)
    val toml = new String(Files.readAllBytes(
      cwd.resolve("graft.toml")), "UTF-8")
    assert(toml.contains("[server]") && toml.contains("port = 3000"), toml)
    assert(toml.contains("[http_webhook]") && toml.contains("[tls]"), toml)
    val (fc, fOut) = run(cwd, "config-gen", "--format", "xml")
    assert(fc == 2 && fOut.contains("Unsupported format"), fOut)
  }
}
