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

  // ---- scroll state: scroll_id -> (remaining docs, page size) ------
  private val scrolls =
    new ConcurrentHashMap[String, (List[String], Int)]()
  @volatile var searchCalls = 0
  @volatile var scrollDeletes = 0

  private def hitsJson(docs: Seq[String], sid: String): String = {
    val hits = docs.map(d => s"""{"_index":"x","_source":$d}""")
      .mkString(",")
    s"""{"_scroll_id":"$sid","took":1,"hits":{"total":{"value":${docs.length}},"hits":[$hits]}}"""
  }

  private def extractInt(body: String, key: String, dflt: Int): Int =
    (s""""$key"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(body)
      .map(_.group(1).toInt).getOrElse(dflt)

  // POST /{index}/_search?scroll=..  and  POST|DELETE /_search/scroll
  server.createContext("/", (x: HttpExchange) => {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
    val path = x.getRequestURI.getPath
    if (requireAuth.exists(a => !auth.contains(a)))
      respond(x, 401, """{"error":"unauthorized"}""")
    else if (path == "/_search/scroll") {
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      val sid = """"scroll_id"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(body).map(_.group(1)).getOrElse("")
      if (x.getRequestMethod == "DELETE") {
        scrollDeletes += 1
        scrolls.remove(sid)
        respond(x, 200, """{"succeeded":true}""")
      } else Option(scrolls.get(sid)) match {
        case None => respond(x, 404, """{"error":"no such scroll"}""")
        case Some((rest, page)) =>
          val (now, later) = rest.splitAt(page)
          scrolls.put(sid, (later, page))
          respond(x, 200, hitsJson(now, sid))
      }
    } else if (path.endsWith("/_search")) {
      searchCalls += 1
      val idx = path.stripPrefix("/").stripSuffix("/_search")
      val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
      val page = extractInt(body, "size", 10)
      val all = Option(indexed.get(idx)).map { l =>
        val b = Seq.newBuilder[String]; l.forEach(b += _); b.result()
      }.getOrElse(Nil)
      // sliced scroll: doc i belongs to slice (i % max == id)
      val sliced =
        if (body.contains("\"slice\"")) {
          val id = extractInt(body, "id", 0)
          val max = extractInt(body, "max", 1)
          all.zipWithIndex.collect { case (d, i) if i % max == id => d }
        } else all
      val sid = java.util.UUID.randomUUID().toString
      val (now, later) = sliced.splitAt(page)
      scrolls.put(sid, (later.toList, page))
      respond(x, 200, hitsJson(now, sid))
    } else respond(x, 404, """{"error":"not found"}""")
  })

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

  test("sliced-scroll read: sink -> index -> executor-parallel read back") {
    val es = new FakeEs()
    try {
      import spark.implicits._
      val conn = EsConnector("es", es.url, "docs", batchSize = 3,
        sliceCount = 3, scrollPage = 4)
      val in = (1 to 25).map(i => (i.toLong, s"k$i", i * 0.5))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      val got = conn.read(spark, Some(schema))
      // one independent scroll per slice, partition-parallel
      assert(got.rdd.getNumPartitions == 3)
      val rows = got.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == (1 to 25).map(i => (i.toLong, s"k$i", i * 0.5)).toSet)
      // 3 slices searched; paging (25 docs / 3 slices / page 4) forces
      // continuation scrolls; every drained slice cleared its context
      assert(es.searchCalls == 3, s"searches=${es.searchCalls}")
      assert(es.scrollDeletes == 3, s"deletes=${es.scrollDeletes}")
    } finally es.stop()
  }

  test("read honors auth; unauthenticated scroll fails loudly") {
    val es = new FakeEs(requireAuth = Some("ApiKey sesame"))
    try {
      import spark.implicits._
      val ok = EsConnector("es", es.url, "sec", apiKey = Some("sesame"),
        sliceCount = 2)
      ok.write(Seq((1L, "x"), (2L, "y")).toDF("id", "kind"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("kind",
          org.apache.spark.sql.types.StringType)))
      assert(ok.read(spark, Some(schema)).count() == 2)
      val anon = EsConnector("es", es.url, "sec", sliceCount = 2)
      val e = intercept[org.apache.spark.SparkException](
        anon.read(spark, Some(schema)).count())
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("401"), msg)
    } finally es.stop()
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
