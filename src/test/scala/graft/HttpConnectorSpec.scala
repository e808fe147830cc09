package graft

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI

import graft.sources.{HttpConnector, HttpWebhookReceiver}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL networked HTTP connector over loopback: webhook source
  * contract (auth / batch-cap / malformed), atomic NDJSON spooling
  * into the landing dir, the Spark streaming read over it, and the
  * sink half POSTing partition batches — including the full
  * sink → webhook → stream round trip.
  */
class HttpConnectorSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()
  private def post(url: String, body: String,
      hdrs: Map[String, String] = Map.empty): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/json")
    hdrs.foreach { case (k, v) => b.header(k, v) }
    client.send(b.POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  test("webhook source: /event + /batch spool and read back; contract codes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_src_")
    val rx = HttpWebhookReceiver.start(dir.toString,
      apiKey = Some("sesame"), maxBatch = 3)
    try {
      val auth = Map("x-api-key" -> "sesame")
      assert(post(s"${rx.url}/event",
        """{"id":1,"kind":"a, b { braces","value":0.5}""", auth)
        .statusCode() == 200)
      assert(post(s"${rx.url}/batch",
        """[{"id":2,"kind":"x","value":1.5}, {"id":3,"kind":"[y]","value":-2.0}]""",
        auth).statusCode() == 200)
      // contract: bad key 401 (and Bearer works), oversize 413,
      // malformed 400, GET 405, unknown path 404
      assert(post(s"${rx.url}/event", """{"id":9}""").statusCode() == 401)
      assert(post(s"${rx.url}/event", """{"id":9}""",
        Map("Authorization" -> "Bearer sesame")).statusCode() == 200)
      assert(post(s"${rx.url}/batch", """[{},{},{},{}]""", auth)
        .statusCode() == 413)
      assert(post(s"${rx.url}/batch", """{"not":"array"}""", auth)
        .statusCode() == 400)
      assert(post(s"${rx.url}/event", """[1,2]""", auth).statusCode() == 400)
      assert(client.send(HttpRequest.newBuilder(URI.create(s"${rx.url}/event"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
        .statusCode() == 405)
      assert(post(s"${rx.url}/nope", "{}", auth).statusCode() == 404)

      val conn = HttpConnector("hooks", dir.toString, rx.url + "/batch")
      val got = conn.read(spark, Some(schema))
        .where(col("id").isNotNull)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set(1L -> "a, b { braces", 2L -> "x", 3L -> "[y]",
        9L -> null))
    } finally rx.stop()
  }

  test("sink -> webhook -> stream round trip over real loopback HTTP") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_rt_")
    val rx = HttpWebhookReceiver.start(dir.toString)
    try {
      val conn = HttpConnector("loop", dir.toString, rx.url + "/batch")
      import spark.implicits._
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in) // executor-side POSTs, one array per partition
      // streaming read over the landing dir sees exactly the posted rows
      spark.sql("DROP VIEW IF EXISTS graft_http_sink")
      val q = conn.readStream(spark, schema)
        .writeStream.format("memory").queryName("graft_http_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("graft_http_sink")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "click", 1.25), (2L, "buy", -0.5),
        (3L, "click", 3.0)))
    } finally rx.stop()
  }

  test("webhook rate limit: 429 over the per-second allowance, refills") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_rl_")
    // injected clock -> deterministic bucket behavior
    var t = 0L
    val rx = HttpWebhookReceiver.start(dir.toString, rateLimit = 2,
      nowNanos = () => t)
    try {
      assert(post(s"${rx.url}/event", """{"id":1}""").statusCode() == 200)
      assert(post(s"${rx.url}/event", """{"id":2}""").statusCode() == 200)
      assert(post(s"${rx.url}/event", """{"id":3}""").statusCode() == 429)
      t += 1000000000L // one second later: allowance refills
      assert(post(s"${rx.url}/event", """{"id":4}""").statusCode() == 200)
    } finally rx.stop()
  }

  test("VPL .to(Hooks) posts the stream's output over real HTTP") {
    import graft.vpl._
    val dir = java.nio.file.Files.createTempDirectory("graft_http_vpl_")
    val rx = HttpWebhookReceiver.start(dir.toString)
    try {
      val vpl =
        """stream Out = Ping
          |    .where(v > 1.0)
          |    .emit(k: k, v: v)
          |    .to(Hooks)
          |""".stripMargin
      val evt = java.nio.file.Files.createTempFile("graft_http_vpl", ".evt")
      java.nio.file.Files.writeString(evt,
        """Ping { k: 1, v: 2.0 }
          |Ping { k: 2, v: 0.5 }
          |Ping { k: 3, v: 4.0 }
          |""".stripMargin)
      val prog = VplParser.parse(vpl)
      val decls = prog.events.map(e => e.name -> e).toMap
      new VplCompiler(prog, new EvtSource(spark, Seq(evt.toString), decls),
        sinks = Map("Hooks" -> HttpConnector(
          "Hooks", dir.toString, rx.url + "/batch"))).compileAllStrict()
      // the VPL program's rows arrived over the wire and landed
      val landed = spark.read.json(dir.toString)
        .collect().map(r => r.getAs[Long]("k")).toSet
      assert(landed == Set(1L, 3L))
    } finally rx.stop()
  }

  test("webhook bounds the body: oversized POST gets 413, never buffers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_cap_")
    val rx = HttpWebhookReceiver.start(dir.toString,
      maxEventBytes = 64, maxBodyBytes = 256)
    try {
      // /event over its per-event byte cap -> 413 (Content-Length
      // rejected before the body is read)
      val big = """{"id":1,"pad":"""" + ("x" * 200) + """"}"""
      assert(post(s"${rx.url}/event", big).statusCode() == 413)
      // /batch whose total body exceeds the batch byte cap -> 413
      val el = """{"id":1,"pad":"""" + ("y" * 40) + """"}"""
      val hugeBatch = Seq.fill(10)(el).mkString("[", ",", "]")
      assert(post(s"${rx.url}/batch", hugeBatch).statusCode() == 413)
      // a batch inside the body cap but with ONE element over the
      // per-event cap -> 413 (reference enforces the 1 MiB/event
      // limit on batch elements too)
      val fatEl = """[{"id":1,"pad":"""" + ("z" * 100) + """"}]"""
      assert(post(s"${rx.url}/batch", fatEl).statusCode() == 413)
      // under both caps still lands
      assert(post(s"${rx.url}/event", """{"id":7}""").statusCode() == 200)
      assert(spark.read.json(dir.toString).count() == 1)
    } finally rx.stop()
  }

  test("pretty-printed JSON spools as ONE NDJSON line and reads back intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_pp_")
    val rx = HttpWebhookReceiver.start(dir.toString)
    try {
      // raw newlines are illegal inside JSON strings, so collapsing
      // them is lossless — without it this event ACKs 200 but reads
      // back as corrupt rows (silent data loss)
      val pretty =
        """{
          |  "id": 42,
          |  "kind": "pretty",
          |  "value": 1.5
          |}""".stripMargin
      assert(post(s"${rx.url}/event", pretty).statusCode() == 200)
      val prettyBatch =
        """[
          |  { "id": 43,
          |    "kind": "batch-pretty", "value": 2.5 },
          |  { "id": 44, "kind": "flat", "value": 3.5 }
          |]""".stripMargin
      assert(post(s"${rx.url}/batch", prettyBatch).statusCode() == 200)
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((42L, "pretty", 1.5), (43L, "batch-pretty", 2.5),
        (44L, "flat", 3.5)))
    } finally rx.stop()
  }

  test("sink chunks each partition: bounded memory, receiver cap can't trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft_http_chunk_")
    // receiver element cap 2; a 5-row single partition MUST chunk to pass
    val rx = HttpWebhookReceiver.start(dir.toString, maxBatch = 2)
    try {
      val conn = HttpConnector("chunky", dir.toString, rx.url + "/batch",
        batchSize = 2)
      import spark.implicits._
      val in = (1L to 5L).map(i => (i, s"k$i", i * 0.5))
        .toDF("id", "kind", "value").coalesce(1)
      conn.write(in) // 3 POSTs (2+2+1) — one giant array would 413
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(_.getLong(0)).toSet
      assert(got == (1L to 5L).toSet)
    } finally rx.stop()
  }

  test("key-aware JSON field scan: values containing key-lookalikes can't mis-extract") {
    import graft.sources.HttpJson.{stringValuesOf, longValueOf}
    // the Kinesis GetRecords shape — the VALUE of one Data field
    // contains the text "Data":"evil" inside a decoded string; regex
    // extraction would pick it up, the key-aware scan must not
    val resp =
      """{"Records":[{"Data":"aGVsbG8=","PartitionKey":"p1"},
        |{"Data":"eyJ4IjogIlwiRGF0YVwiOlwiZXZpbFwiIn0=","PartitionKey":"\"Data\":\"nope\""}],
        |"NextShardIterator":"it2","MillisBehindLatest":0}""".stripMargin
    assert(stringValuesOf(resp, "Data") ==
      Seq("aGVsbG8=", "eyJ4IjogIlwiRGF0YVwiOlwiZXZpbFwiIn0="))
    assert(stringValuesOf(resp, "NextShardIterator") == Seq("it2"))
    // escaped quotes inside values decode; keys inside values ignored
    assert(stringValuesOf("""{"a":"x\"y","b":"A"}""", "a") == Seq("x\"y"))
    assert(stringValuesOf("""{"a":"A"}""", "a") == Seq("A"))
    assert(longValueOf("""{"FailedRecordCount":3,"o":{"n":-7}}""",
      "FailedRecordCount") == Some(3L))
    assert(longValueOf("""{"o":{"n":-7}}""", "n") == Some(-7L))
    assert(longValueOf("""{"s":"FailedRecordCount: 9"}""",
      "FailedRecordCount").isEmpty)
    assert(stringValuesOf("""{"s":"not here"}""", "missing").isEmpty)
  }

  test("top-level array splitter: nesting, strings, escapes, rejects") {
    import graft.sources.HttpJson.splitTopLevelArray
    assert(splitTopLevelArray("""[{"a":[1,2],"b":"x,]}"},{"c":{"d":","}}]""")
      == Some(Seq("""{"a":[1,2],"b":"x,]}"}""", """{"c":{"d":","}}""")))
    assert(splitTopLevelArray("""[{"q":"\"esc,\""}]""")
      == Some(Seq("""{"q":"\"esc,\""}""")))
    assert(splitTopLevelArray("[]") == Some(Seq.empty))
    assert(splitTopLevelArray("""{"a":1}""").isEmpty)
    assert(splitTopLevelArray("""[{"a":1}""").isEmpty)    // unbalanced
    assert(splitTopLevelArray("""[{"a":"unterminated]""").isEmpty)
  }
}
