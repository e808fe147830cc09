package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.{RestConnector, RestPoller}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL REST polling source over loopback (reference rest_api.rs):
  * a JDK HttpServer plays the external API — serving rotating JSON
  * payloads, requiring auth headers, failing transiently to exercise
  * the retry path — and the poller GETs it on an interval, spooling
  * responses into the landing dir that Spark's json source reads.
  */
class RestConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  /** A fake API serving `pages` in sequence (repeating the last one
    * once exhausted), optionally rejecting requests lacking `auth`
    * and failing the first `transientFailures` requests with 503.
    */
  private def fakeApi(pages: Seq[String], auth: Option[String] = None,
      transientFailures: Int = 0): (HttpServer, String, AtomicInteger) = {
    val served = new AtomicInteger(0)
    val fails = new AtomicInteger(transientFailures)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val ok = auth.forall(a =>
          Option(x.getRequestHeaders.getFirst("Authorization"))
            .contains(s"Bearer $a"))
        val (code, body) =
          if (!ok) (401, "unauthorized")
          else if (fails.getAndDecrement() > 0) (503, "try later")
          else {
            val i = served.getAndIncrement()
            (200, pages(math.min(i, pages.length - 1)))
          }
        val b = body.getBytes(UTF_8)
        x.sendResponseHeaders(code, b.length.toLong)
        val os = x.getResponseBody
        try os.write(b) finally os.close()
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}", served)
  }

  private def awaitCondition(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(20)
    assert(cond, s"condition not met within $timeoutMs ms")
  }

  test("poller GETs object and array pages, spools NDJSON, Spark reads back") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_src_")
    // page 1: single pretty-printed object (newline-collapse path);
    // page 2: a top-level array -> one line per element
    val (srv, url, served) = fakeApi(Seq(
      "{\n  \"id\": 1,\n  \"kind\": \"solo\",\n  \"value\": 0.5\n}",
      """[{"id":2,"kind":"arr","value":1.5},{"id":3,"kind":"arr","value":2.5}]"""),
      auth = Some("sesame"))
    val p = RestPoller.start(url, "/feed", dir.toString,
      bearerToken = Some("sesame"), intervalMs = 50, retryCount = 0)
    try {
      // await the THIRD request: the poll loop is sequential, so a
      // third GET proves the second page was fully spooled (awaiting
      // served >= 2 raced the page-2 spool against p.stop() — the
      // response counter ticks when the server builds the body, not
      // when the poller lands it)
      awaitCondition(10000)(served.get() >= 3)
    } finally { p.stop(); srv.stop(0) }
    val got = spark.read.schema(schema).json(dir.toString)
      .select("id", "kind", "value").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "solo", 0.5), (2L, "arr", 1.5), (3L, "arr", 2.5)))
    assert(p.pollCount >= 2 && p.failureCount == 0)
  }

  test("poller retries transient 503s (reference retry_count) and recovers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_retry_")
    // first two requests 503; retryCount=3 must absorb them inside
    // ONE poll and still deliver the page
    val (srv, url, _) = fakeApi(
      Seq("""{"id":7,"kind":"late","value":9.5}"""), transientFailures = 2)
    val p = RestPoller.start(url, "/feed", dir.toString,
      intervalMs = 50, retryCount = 3)
    try {
      awaitCondition(10000)(p.pollCount >= 1)
    } finally { p.stop(); srv.stop(0) }
    val got = spark.read.schema(schema).json(dir.toString)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(7L))
  }

  test("missing auth keeps failing, nothing spools, failures count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_noauth_")
    val (srv, url, _) = fakeApi(Seq("""{"id":1}"""), auth = Some("sesame"))
    val p = RestPoller.start(url, "/feed", dir.toString,
      intervalMs = 50, retryCount = 0) // no token
    try {
      awaitCondition(10000)(p.failureCount >= 2)
    } finally { p.stop(); srv.stop(0) }
    assert(p.pollCount == 0)
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(dir.toString))
      .iterator().hasNext)
  }

  test("streaming read over the poll landing dir; sink POSTs back out") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_stream_")
    val (srv, url, served) = fakeApi(Seq(
      """[{"id":10,"kind":"s","value":1.0},{"id":11,"kind":"s","value":2.0}]"""))
    val p = RestPoller.start(url, "/feed", dir.toString, intervalMs = 50,
      retryCount = 0)
    try awaitCondition(10000)(served.get() >= 1)
    finally { p.stop(); srv.stop(0) }
    // streaming half: the landing dir drives a watermarked stream
    val conn = RestConnector("api", dir.toString, sinkUrl = null)
    val q = conn.readStream(spark, schema)
      .groupBy(col("kind")).agg(sum(col("value")).as("total"))
      .writeStream.format("memory").queryName("graft_rest_sink")
      .outputMode("complete").start()
    try { q.processAllAvailable() } finally q.stop()
    val rows = spark.table("graft_rest_sink").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(rows == Set(("s", 3.0)))
    // sink half: RestConnector.write shares the chunked-POST contract
    // — round-trip into a webhook receiver landing dir
    val rxDir = java.nio.file.Files.createTempDirectory("graft_rest_rt_")
    val rx = graft.sources.HttpWebhookReceiver.start(rxDir.toString)
    try {
      import spark.implicits._
      val out = RestConnector("api", dir.toString, rx.url + "/batch")
      out.write(Seq((20L, "rt", 5.0)).toDF("id", "kind", "value"))
      val back = spark.read.schema(schema).json(rxDir.toString)
        .collect().map(_.getLong(0)).toSet
      assert(back == Set(20L))
    } finally rx.stop()
  }
}
