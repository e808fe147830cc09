package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL HTTP transport for the connector surface (reference
  * connector/http.rs) — actual loopback-tested networking, zero new
  * dependencies (JDK HttpServer + java.net.http.HttpClient), closing
  * the "every broker is a file stand-in" gap for the one reference
  * transport a hermetic container can genuinely exercise.
  *
  * Source half = the reference's HttpWebhookSource contract
  * (http.rs:81-137): POST one JSON object to `/event` or a JSON
  * array to `/batch`; optional `x-api-key` / `Authorization: Bearer`
  * auth (401), max batch size (413), malformed payloads 400.
  * Accepted events spool ATOMICALLY (tmp file + rename) as NDJSON
  * into a landing directory and the stream is Spark's file source
  * over it — the webhook → landing-zone → stream shape a
  * DISTRIBUTED engine actually deploys: the reference pushes into an
  * in-process channel, but Spark's executors do not live in the
  * webhook's process, and micro-files in a landing zone are the
  * standard bridge (exactly-once via file-source tracking).
  *
  * Sink half = HttpSink (http.rs:15-73): events POST as JSON with
  * Content-Type application/json and optional extra headers; graft
  * posts ONE ARRAY PER PARTITION to the configured URL (the webhook
  * `/batch` contract — per-event POSTs, the reference's default,
  * multiply network round-trips by event count at 100 TB), each
  * executor posting its partitions independently.
  */
final class HttpWebhookReceiver private (
    server: HttpServer,
    spoolDir: String,
    apiKey: Option[String],
    maxBatch: Int,
    rateLimit: Int,
    maxEventBytes: Int,
    maxBodyBytes: Int,
    nowNanos: () => Long) {

  def port: Int = server.getAddress.getPort
  def url: String = s"http://127.0.0.1:$port"
  def stop(): Unit = server.stop(0)

  // Token bucket (reference HttpWebhookConfig.rate_limit, requests/s;
  // 0 = unlimited): refills rateLimit tokens each wall second, burst
  // capacity = one second's allowance. The clock injects for
  // deterministic specs.
  private object bucket {
    private var tokens = rateLimit.toLong
    private var windowStart = nowNanos()
    def tryAcquire(): Boolean = synchronized {
      if (rateLimit <= 0) true
      else {
        val now = nowNanos()
        val elapsed = (now - windowStart) / 1000000000L
        if (elapsed > 0) {
          tokens = math.min(rateLimit.toLong, tokens + elapsed * rateLimit)
          windowStart += elapsed * 1000000000L
        }
        if (tokens > 0) { tokens -= 1; true } else false
      }
    }
  }

  private def authorized(x: HttpExchange): Boolean = apiKey.forall { k =>
    val h = x.getRequestHeaders
    Option(h.getFirst("x-api-key")).contains(k) ||
      Option(h.getFirst("Authorization")).contains(s"Bearer $k")
  }

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(UTF_8)
    x.sendResponseHeaders(code, b.length.toLong)
    val os = x.getResponseBody
    try os.write(b) finally os.close()
  }

  /** Bounded body read (reference limits.rs:1-32 enforced at
    * http.rs:237,290: payload byte caps checked BEFORE parse). Two
    * layers, both ahead of any unbounded allocation: a declared
    * Content-Length over the cap is rejected without reading the
    * body at all, and a chunked/undeclared body is read through a
    * capped loop that stops the moment it crosses the cap — a
    * multi-GB POST can never buffer in the receiver. Returns None
    * when the cap was exceeded (-> 413).
    */
  private def readBounded(x: HttpExchange, cap: Int): Option[Array[Byte]] = {
    val declared = Option(x.getRequestHeaders.getFirst("Content-Length"))
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    if (declared.exists(_ > cap)) None
    else {
      val in = x.getRequestBody
      val out = new java.io.ByteArrayOutputStream(
        math.min(cap, declared.getOrElse(8192L).toInt.max(16)))
      val buf = new Array[Byte](8192)
      var over = false
      var n = in.read(buf)
      while (n >= 0 && !over) {
        if (out.size().toLong + n > cap) over = true
        else { out.write(buf, 0, n); n = in.read(buf) }
      }
      if (over) None else Some(out.toByteArray)
    }
  }

  /** Literal \n / \r are ILLEGAL inside JSON string literals (they
    * must be escaped as \\n / \\r), so any raw newline in an accepted
    * payload is inter-token whitespace — collapsing it to a space is
    * lossless and keeps each spooled record on ONE physical NDJSON
    * line. Without this, a pretty-printed object passes the shape
    * check, spans multiple lines in the spool, and Spark's
    * line-delimited json source reads it back as corrupt rows —
    * ACKed 200 but silently lost.
    */
  private def oneLine(s: String): String = s.replaceAll("[\n\r]+", " ")

  /** Atomic spool: NDJSON lines land as one part file via tmp+rename,
    * so Spark's file stream source never lists a half-written file.
    */
  // AtomicLong: webhook handlers may run on concurrent threads
  private val spoolSeq = new java.util.concurrent.atomic.AtomicLong
  private def spool(lines: Seq[String]): Unit = {
    val dir = Paths.get(spoolDir)
    Files.createDirectories(dir)
    // zero-padded arrival sequence in the name: lexicographic listing
    // order IS arrival order (boundSource derives deterministic
    // synthetic event time from it on the batch `.from` route)
    val id = f"${spoolSeq.getAndIncrement()}%016d-${java.util.UUID.randomUUID().toString}"
    val tmp = dir.resolve(s".tmp-$id")
    Files.write(tmp, lines.mkString("", "\n", "\n").getBytes(UTF_8))
    Files.move(tmp, dir.resolve(s"part-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def handler(batch: Boolean): HttpHandler = new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      val out =
        if (x.getRequestMethod != "POST") (405, "POST only\n")
        else if (!authorized(x)) (401, "unauthorized\n")
        else if (!bucket.tryAcquire()) (429, "rate limit exceeded\n")
        else readBounded(x, if (batch) maxBodyBytes else maxEventBytes) match {
          case None =>
            val cap = if (batch) maxBodyBytes else maxEventBytes
            (413, s"payload exceeds $cap bytes\n")
          case Some(bytes) =>
            val body = new String(bytes, UTF_8).trim
            if (batch) HttpJson.splitTopLevelArray(body) match {
              case None => (400, "expected a JSON array\n")
              case Some(evs) if evs.length > maxBatch =>
                (413, s"batch of ${evs.length} exceeds max $maxBatch\n")
              // UTF-8 BYTE length, matching readBounded's single-event
              // semantics (String.length counts UTF-16 chars — a
              // multi-byte element could pass a char check at ~3x the
              // byte cap)
              case Some(evs)
                  if evs.exists(_.getBytes(UTF_8).length > maxEventBytes) =>
                (413, s"batch element exceeds $maxEventBytes bytes\n")
              case Some(evs) =>
                if (evs.nonEmpty) spool(evs.map(oneLine))
                (200, s"""{"accepted":${evs.length}}""" + "\n")
            }
            else if (body.startsWith("{") && body.endsWith("}")) {
              spool(Seq(oneLine(body)))
              (200, """{"accepted":1}""" + "\n")
            } else (400, "expected a JSON object\n")
        }
      respond(x, out._1, out._2)
    }
  }

  server.createContext("/event", handler(batch = false))
  server.createContext("/batch", handler(batch = true))
  server.createContext("/", new HttpHandler {
    override def handle(x: HttpExchange): Unit =
      respond(x, 404, "POST /event or /batch\n")
  })
  server.start()
}

object HttpWebhookReceiver {
  /** maxEventBytes / maxBodyBytes mirror the reference's payload
    * limits (limits.rs:1-32: 1 MiB per event; a batch body cap
    * enforced before parsing).
    */
  def start(spoolDir: String, port: Int = 0, apiKey: Option[String] = None,
      maxBatch: Int = 10000, rateLimit: Int = 0,
      maxEventBytes: Int = 1 << 20, maxBodyBytes: Int = 16 << 20,
      nowNanos: () => Long = () => System.nanoTime()): HttpWebhookReceiver = {
    // no Nagle+delayed-ACK stalls on keep-alive webhook posts
    System.setProperty("sun.net.httpserver.nodelay", "true")
    new HttpWebhookReceiver(
      HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0),
      spoolDir, apiKey, maxBatch, rateLimit, maxEventBytes, maxBodyBytes,
      nowNanos)
  }
}

private[graft] object HttpJson {
  /** Split a top-level JSON array into its element strings without a
    * JSON dependency: depth counting over {}/[] with string-literal
    * and escape awareness. Returns None when the input is not an
    * array; nested structure inside elements is preserved verbatim.
    */
  def splitTopLevelArray(s: String): Option[Seq[String]] = {
    val t = s.trim
    if (!(t.startsWith("[") && t.endsWith("]"))) return None
    val inner = t.substring(1, t.length - 1)
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = 0
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (esc) esc = false
      else if (inStr) {
        if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          val e = inner.substring(start, i).trim
          if (e.nonEmpty) out += e
          start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = inner.substring(start).trim
    if (last.nonEmpty) out += last
    if (depth != 0 || inStr) None else Some(out.result())
  }

  /** All string values of object fields named `key`, anywhere in
    * `json` — found by a string-literal/escape-aware scan, not regex:
    * only actual object KEYS match (a string is a key iff the next
    * non-space char is ':'), so a VALUE that happens to contain
    * `"Data":` text cannot mis-extract, and escaped quotes inside
    * values are handled. Standard JSON escapes are decoded.
    */
  def stringValuesOf(json: String, key: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = json.length
    def skipWs(j0: Int): Int = {
      var j = j0
      while (j < n && json.charAt(j).isWhitespace) j += 1
      j
    }
    /** parse the string literal starting at the opening quote;
      * returns (decoded, indexAfterClosingQuote) */
    def readStr(j0: Int): (String, Int) = {
      val sb = new java.lang.StringBuilder
      var j = j0 + 1
      while (j < n && json.charAt(j) != '"') {
        val c = json.charAt(j)
        if (c == '\\' && j + 1 < n) {
          json.charAt(j + 1) match {
            case '"'  => sb.append('"'); j += 2
            case '\\' => sb.append('\\'); j += 2
            case '/'  => sb.append('/'); j += 2
            case 'n'  => sb.append('\n'); j += 2
            case 't'  => sb.append('\t'); j += 2
            case 'r'  => sb.append('\r'); j += 2
            case 'b'  => sb.append('\b'); j += 2
            case 'f'  => sb.append('\f'); j += 2
            case 'u' if j + 5 < n =>
              sb.append(Integer.parseInt(json.substring(j + 2, j + 6), 16)
                .toChar)
              j += 6
            case o => sb.append(o); j += 2
          }
        } else { sb.append(c); j += 1 }
      }
      (sb.toString, j + 1)
    }
    while (i < n) {
      if (json.charAt(i) == '"') {
        val (s, after) = readStr(i)
        val colon = skipWs(after)
        if (colon < n && json.charAt(colon) == ':') {
          // `s` is a KEY; when it matches and the value is a string,
          // capture the value (and continue scanning after it)
          val vStart = skipWs(colon + 1)
          if (s == key && vStart < n && json.charAt(vStart) == '"') {
            val (v, vAfter) = readStr(vStart)
            out += v
            i = vAfter
          } else i = colon + 1
        } else i = after
      } else i += 1
    }
    out.result()
  }

  /** All OBJECT values of fields named `key` (e.g. every `_source`
    * document in an ES search response), captured verbatim by
    * balanced-brace counting with string-literal/escape awareness —
    * same key-position rule as [[stringValuesOf]].
    */
  def objectValuesOf(json: String, key: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val n = json.length
    def skipWs(j0: Int): Int = {
      var j = j0
      while (j < n && json.charAt(j).isWhitespace) j += 1
      j
    }
    def skipStr(j0: Int): Int = { // j0 at opening quote; returns after close
      var j = j0 + 1
      while (j < n && json.charAt(j) != '"') {
        if (json.charAt(j) == '\\') j += 1
        j += 1
      }
      j + 1
    }
    while (i < n) {
      if (json.charAt(i) == '"') {
        val after = skipStr(i)
        val s = json.substring(i + 1, math.min(after - 1, n))
        val colon = skipWs(after)
        if (colon < n && json.charAt(colon) == ':' && s == key) {
          val vStart = skipWs(colon + 1)
          if (vStart < n && json.charAt(vStart) == '{') {
            var depth = 0
            var j = vStart
            var end = -1
            while (j < n && end < 0) {
              json.charAt(j) match {
                case '"' => j = skipStr(j) - 1
                case '{' => depth += 1
                case '}' => depth -= 1; if (depth == 0) end = j
                case _   =>
              }
              j += 1
            }
            if (end > 0) { out += json.substring(vStart, end + 1); i = end + 1 }
            else i = vStart + 1
          } else i = colon + 1
        } else i = after
      } else i += 1
    }
    out.result()
  }

  /** First numeric value of an object field named `key` (integer),
    * via the same key-aware scan.
    */
  def longValueOf(json: String, key: String): Option[Long] = {
    var i = 0
    val n = json.length
    def skipWs(j0: Int): Int = {
      var j = j0
      while (j < n && json.charAt(j).isWhitespace) j += 1
      j
    }
    while (i < n) {
      if (json.charAt(i) == '"') {
        // skip the string literal (escape-aware)
        var j = i + 1
        while (j < n && json.charAt(j) != '"') {
          if (json.charAt(j) == '\\') j += 1
          j += 1
        }
        val s = json.substring(i + 1, math.min(j, n))
        val colon = skipWs(j + 1)
        if (colon < n && json.charAt(colon) == ':' && s == key) {
          var k = skipWs(colon + 1)
          val start = k
          if (k < n && json.charAt(k) == '-') k += 1
          while (k < n && json.charAt(k).isDigit) k += 1
          if (k > start)
            return scala.util.Try(json.substring(start, k).toLong).toOption
        }
        i = j + 1
      } else i += 1
    }
    None
  }
}

/** The registry-facing connector: readStream/read over the webhook's
  * landing directory, write POSTs partition batches to `sinkUrl`.
  */
final case class HttpConnector(
    name: String,
    spoolDir: String,
    sinkUrl: String,
    headers: Map[String, String] = Map.empty,
    batchSize: Int = 10000) extends Connector {

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(spoolDir)
  }

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(spoolDir)

  override def write(df: DataFrame): Unit = {
    val url = sinkUrl
    val hdrs = headers.toSeq
    val chunk = batchSize
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      // Client built executor-side, per partition — the per-partition
      // init point the reference's connection pool corresponds to.
      // The partition streams through grouped() in batchSize-sized
      // array POSTs: memory is bounded by one chunk regardless of
      // partition size, and a chunk can never trip the receiving
      // webhook's maxBatch element cap (default matches).
      lazy val client = java.net.http.HttpClient.newHttpClient()
      it.grouped(chunk).foreach { rows =>
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .header("Content-Type", "application/json")
        hdrs.foreach { case (k, v) => b.header(k, v) }
        val req = b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          rows.mkString("[", ",", "]"))).build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(
            s"http sink POST $url returned ${resp.statusCode()}: ${resp.body()}")
      }
    }
  }
}
