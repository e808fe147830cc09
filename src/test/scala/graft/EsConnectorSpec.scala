package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.EsConnector
import org.apache.spark.sql.functions._

/** Loopback fake-ES FIXTURE + spec for the REAL Elasticsearch sink:
  * a JDK HttpServer implementing the documented `_bulk` contract
  * (NDJSON action/doc pairs, per-item results, HTTP-200-with-errors
  * semantics, Basic/ApiKey auth) far enough that the product-side
  * bulk client is exercised over real HTTP.
  */
final class FakeEs(requireAuth: Option[String] = None) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  // index name -> indexed source lines
  val indexed = new ConcurrentHashMap[String, java.util.List[String]]()
  @volatile var bulkCalls = 0

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, b.length.toLong)
    val os = x.getResponseBody
    try os.write(b) finally os.close()
  }

  server.createContext("/_bulk", (x: HttpExchange) => {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
    if (requireAuth.exists(a => !auth.contains(a)))
      respond(x, 401, """{"error":"unauthorized"}""")
    else {
      bulkCalls += 1
      val lines = new String(x.getRequestBody.readAllBytes(), UTF_8)
        .split("\n").filter(_.nonEmpty)
      val items = lines.grouped(2).map { pair =>
        val idx = """"_index"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(pair(0)).map(_.group(1)).getOrElse("?")
        if (pair(1).contains("poison"))
          s"""{"index":{"_index":"$idx","status":400,"error":{"type":"mapper_parsing_exception"}}}"""
        else {
          indexed.computeIfAbsent(idx,
            _ => new java.util.concurrent.CopyOnWriteArrayList[String]())
            .add(pair(1))
          s"""{"index":{"_index":"$idx","status":201}}"""
        }
      }.toSeq
      val errors = items.exists(_.contains("\"status\":400"))
      respond(x, 200,
        s"""{"took":1,"errors":$errors,"items":[${items.mkString(",")}]}""")
    }
  })
  server.start()
}

class EsConnectorSpec extends SparkSpec {

  test("bulk sink indexes partition chunks over real loopback HTTP") {
    val es = new FakeEs()
    try {
      import spark.implicits._
      val conn = EsConnector("es", es.url, "events", batchSize = 2)
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0),
        (4L, "buy", 0.75), (5L, "click", -1.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in)
      // every row landed, chunked: 5 rows / batch 2 over 2 partitions
      // means at least 3 bulk calls (bounded memory per POST)
      val docs = Option(es.indexed.get("events")).map { l =>
        val b = Seq.newBuilder[String]; l.forEach(b += _); b.result()
      }.getOrElse(Nil)
      val ids = docs.map(d => """"id":(\d+)""".r
        .findFirstMatchIn(d).get.group(1).toLong).toSet
      assert(ids == Set(1L, 2L, 3L, 4L, 5L))
      assert(es.bulkCalls >= 3, s"expected chunked POSTs, got ${es.bulkCalls}")
    } finally es.stop()
  }

  test("index date pattern expands once per write, UTC") {
    val es = new FakeEs()
    try {
      import spark.implicits._
      // 2026-02-03 12:00:00 UTC, injected
      val t = java.time.Instant.parse("2026-02-03T12:00:00Z").toEpochMilli
      val conn = EsConnector("es", es.url, "events-{yyyy}.{MM}.{dd}",
        nowMillis = () => t)
      assert(conn.expandIndex(t) == "events-2026.02.03")
      conn.write(Seq((1L, "x")).toDF("id", "kind"))
      assert(es.indexed.containsKey("events-2026.02.03"))
    } finally es.stop()
  }

  test("auth: ApiKey and Basic headers reach the wire; missing auth fails") {
    val es = new FakeEs(requireAuth = Some("ApiKey sesame"))
    try {
      import spark.implicits._
      val ok = EsConnector("es", es.url, "ix", apiKey = Some("sesame"))
      ok.write(Seq((1L, "x")).toDF("id", "kind"))
      assert(es.indexed.containsKey("ix"))
      val bad = EsConnector("es", es.url, "ix")
      val e = intercept[org.apache.spark.SparkException] {
        bad.write(Seq((2L, "y")).toDF("id", "kind"))
      }
      assert(e.getMessage.contains("401") ||
        Option(e.getCause).exists(_.getMessage.contains("401")))
    } finally es.stop()
    val basicEs = new FakeEs(requireAuth = Some("Basic " +
      java.util.Base64.getEncoder.encodeToString("u:p".getBytes(UTF_8))))
    try {
      import spark.implicits._
      val conn = EsConnector("es", basicEs.url, "ix2",
        username = Some("u"), password = Some("p"))
      conn.write(Seq((3L, "z")).toDF("id", "kind"))
      assert(basicEs.indexed.containsKey("ix2"))
    } finally basicEs.stop()
  }

  test("HTTP 200 with per-item errors fails the write loudly") {
    val es = new FakeEs()
    try {
      import spark.implicits._
      val conn = EsConnector("es", es.url, "ix")
      val e = intercept[org.apache.spark.SparkException] {
        conn.write(Seq((1L, "fine"), (2L, "poison pill")).toDF("id", "kind"))
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("rejected items"),
        s"item-level failures must not be silently dropped: $msg")
    } finally es.stop()
  }
}
