package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL REST-API connector (reference connector/rest_api.rs) — the
  * polling GET half that http.rs's push webhook does not cover. The
  * reference builds a reqwest client with default headers +
  * `with_bearer_token`/`with_api_key` + timeout_ms + retry_count
  * (rest_api.rs:10-47) and turns each successful JSON response into
  * an event (rest_api.rs:83-107); its sink POSTs events back
  * (rest_api.rs:188+).
  *
  * graft's shape: a driver-side poller GETs the endpoint on a fixed
  * interval, retries transient failures with linear backoff up to
  * `retryCount` (the reference's retry knob), and spools each
  * successful response ATOMICALLY as NDJSON into a landing directory
  * — one JSON object becomes one line, a top-level array becomes one
  * line per element (the same tolerant contract as the webhook's
  * /event vs /batch). Spark's json file source — batch or streaming —
  * reads the landing dir, so executors never talk to the API: on a
  * 1000-executor cluster you want exactly ONE poller hitting a rate-
  * limited REST endpoint, not one per task, and the file source gives
  * exactly-once delivery downstream via its file tracking. The sink
  * half reuses the chunked-POST contract (bounded memory per
  * partition, executor-side clients).
  *
  * Spool ceiling: analytic, not measured — the poller is interval-
  * bound by construction (events/s = elements-per-response /
  * intervalMs), and the right fix for more volume is a bigger
  * response page or more endpoints, never more pollers against the
  * same rate-limited API.
  */
final class RestPoller private (
    baseUrl: String,
    path: String,
    spoolDir: String,
    headers: Map[String, String],
    intervalMs: Long,
    timeoutMs: Long,
    retryCount: Int) extends PollerHealth {

  @volatile private var running = true
  @volatile private var polls = 0L
  @volatile private var failures = 0L

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  /** One GET with the reference's retry semantics: non-2xx or a
    * connect/timeout failure retries up to retryCount times with
    * linear backoff before counting a failed poll. Returns the body
    * on success.
    */
  private def getOnce(): Option[String] = {
    var attempt = 0
    while (attempt <= retryCount && running) {
      try {
        val b = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(baseUrl + path))
          .timeout(java.time.Duration.ofMillis(timeoutMs)).GET()
        headers.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 == 2) return Some(resp.body())
      } catch { case _: java.io.IOException | _: InterruptedException => }
      attempt += 1
      if (attempt <= retryCount) Thread.sleep(attempt * 50L)
    }
    None
  }

  private def oneLine(s: String): String = s.replaceAll("[\n\r]+", " ")

  /** Same atomic tmp+rename landing as the webhook spool — the file
    * stream source never lists a half-written part.
    */
  private var spoolSeq = 0L
  private def spool(lines: Seq[String]): Unit = if (lines.nonEmpty) {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // zero-padded arrival sequence in the name: lexicographic listing
    // order IS arrival order (boundSource derives deterministic
    // synthetic event time from it on the batch `.from` route)
    val id = f"$spoolSeq%016d-${java.util.UUID.randomUUID().toString}"
    spoolSeq += 1
    val tmp = dir.resolve(s".tmp-$id")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(s"part-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  @volatile private var terminal: Option[Throwable] = None

  private val thread = new Thread(() => {
    var consecutive = 0
    // same resilience contract as the brokered transports: a NON-IO
    // fault (pathological body crashing the JSON scan, spool-dir IO
    // surfacing as a runtime error) counts a failure and keeps
    // polling; too many CONSECUTIVE faults set terminalError. No
    // exception may kill this thread while isDead reads false.
    while (running && terminal.isEmpty) {
      try {
        getOnce() match {
          case Some(body) =>
            polls += 1
            val t = body.trim
            HttpJson.splitTopLevelArray(t) match {
              case Some(evs) => spool(evs.map(oneLine))
              case None =>
                if (t.startsWith("{") && t.endsWith("}")) spool(Seq(oneLine(t)))
                else failures += 1 // non-JSON body: counted, not spooled
            }
            consecutive = 0
          case None => failures += 1
        }
      } catch {
        case _: InterruptedException => ()
        case e: Throwable if running =>
          failures += 1
          consecutive += 1
          if (consecutive > 8) {
            terminal = Some(e)
            System.err.println(
              s"graft-rest-poller: terminal after 8 consecutive faults: $e")
          } else System.err.println(s"graft-rest-poller: poll failed: $e")
        case _: Throwable if !running => ()
      }
      if (running && terminal.isEmpty)
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () } // stop()
    }
  }, s"graft-rest-poller-$baseUrl$path")
  thread.setDaemon(true)

  def pollCount: Long = polls
  def failureCount: Long = failures
  override def deliveredCount: Long = polls
  override def healthFailures: Long = failures
  /** The exception that killed the poll loop, if any — None while
    * healthy or after a clean stop().
    */
  def terminalError: Option[Throwable] = terminal
  def isDead: Boolean = terminal.isDefined

  def stop(): Unit = {
    running = false
    thread.interrupt()
    thread.join(timeoutMs + intervalMs)
  }
}

object RestPoller {
  /** Defaults mirror RestApiConfig::new (rest_api.rs:19-27):
    * 5000 ms timeout, 3 retries. `bearerToken`/`apiKey` are the
    * reference's with_bearer_token / with_api_key conveniences.
    */
  def start(baseUrl: String, path: String, spoolDir: String,
      headers: Map[String, String] = Map.empty,
      bearerToken: Option[String] = None,
      apiKey: Option[(String, String)] = None,
      intervalMs: Long = 1000L, timeoutMs: Long = 5000L,
      retryCount: Int = 3): RestPoller = {
    val hdrs = headers ++
      bearerToken.map(t => "Authorization" -> s"Bearer $t") ++
      apiKey.map { case (k, v) => k -> v }
    val p = new RestPoller(baseUrl, path, spoolDir, hdrs, intervalMs,
      timeoutMs, retryCount)
    p.thread.start()
    p
  }
}

/** Registry-facing REST connector: reads (batch or stream) come off
  * the poller's landing directory; write POSTs partition chunks to
  * `sinkUrl` — the RestApiSink half (rest_api.rs:188+), sharing the
  * webhook sink's bounded-chunk contract.
  */
final case class RestConnector(
    name: String,
    spoolDir: String,
    sinkUrl: String,
    headers: Map[String, String] = Map.empty,
    batchSize: Int = 10000) extends Connector {

  private def asHttp = HttpConnector(name, spoolDir, sinkUrl, headers,
    batchSize)

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame =
    asHttp.read(spark, schema)

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    asHttp.readStream(spark, schema)

  override def write(df: DataFrame): Unit = asHttp.write(df)
}
