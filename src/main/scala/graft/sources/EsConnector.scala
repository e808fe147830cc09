package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL Elasticsearch sink transport (reference connector/
  * elasticsearch.rs) — the bulk-indexing contract over actual HTTP,
  * zero new dependencies (java.net.http), loopback-tested against an
  * in-process fake ES the same way the webhook/REST connectors are.
  * The reference's shipped connector is itself a feature-gated stub
  * (elasticsearch.rs:108-129 returns NotAvailable without the
  * `elasticsearch` feature); its gated implementation defines the
  * semantics reproduced here:
  *
  *  - bulk indexing via `_bulk` (elasticsearch.rs:220-252): each
  *    document is an action line `{"index":{"_index":…}}` followed by
  *    its source line, NDJSON, flushed every `batch_size` docs;
  *  - index date patterns `{yyyy}`/`{MM}`/`{dd}` expand at send time
  *    (elasticsearch.rs:210-218) — graft expands ONCE per write from
  *    an injectable clock, so a batch lands in one deterministic
  *    index instead of straddling a midnight rollover mid-write;
  *  - basic (username/password) or ApiKey auth
  *    (elasticsearch.rs:183-196) as Authorization headers;
  *  - a bulk response is HTTP 200 even when individual items failed —
  *    the real contract gotcha — so the sink checks the response's
  *    `"errors"` flag and fails the write loudly when any item was
  *    rejected (the reference only checks the status code,
  *    elasticsearch.rs:238-244, and would silently drop failed
  *    items).
  *
  * Spark-first shape: the sink runs executor-side, one HTTP client
  * per partition, the partition streamed through `grouped(batchSize)`
  * bulk POSTs — bounded memory, and a 1000-executor cluster indexes
  * in parallel against the cluster-side load balancer exactly as the
  * es-hadoop connector does. Since r11 the READ half exists too —
  * executor-parallel sliced scroll (see [[EsScroll]] and `read`) —
  * which EXCEEDS the reference (ElasticsearchSink has no source
  * half).
  */
/** Executor-side scroll client: one slice of an index, paged lazily
  * through the documented scroll API (`POST /{index}/_search?scroll=`
  * then `POST /_search/scroll`), the context DELETEd when drained.
  * Responses parse through the key-aware JSON scan (no regex, no
  * dependency): `_source` objects via balanced-brace capture,
  * `_scroll_id` via the string scan.
  */
private[graft] object EsScroll {

  private def post(client: java.net.http.HttpClient, url: String,
      body: String, hdr: Option[(String, String)],
      method: String = "POST"): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .method(method,
        java.net.http.HttpRequest.BodyPublishers.ofString(body))
    hdr.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"es $method $url returned ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  /** Lazily iterate every `_source` document of slice `sliceId`/`max`
    * of `index` (match_all, `_doc` order — the fastest scroll sort).
    */
  def slice(baseUrl: String, index: String, hdr: Option[(String, String)],
      sliceId: Int, max: Int, page: Int,
      keepAlive: String = "1m"): Iterator[String] = {
    val client = java.net.http.HttpClient.newHttpClient()
    val base = baseUrl.stripSuffix("/")
    val sliceClause =
      if (max > 1) s""""slice":{"id":$sliceId,"max":$max},""" else ""
    val first = post(client, s"$base/$index/_search?scroll=$keepAlive",
      s"""{$sliceClause"size":$page,"sort":["_doc"],"query":{"match_all":{}}}""",
      hdr)
    new scala.collection.AbstractIterator[String] {
      private var sid = HttpJson.stringValuesOf(first, "_scroll_id")
        .headOption.getOrElse(
          throw new java.io.IOException(s"es: no _scroll_id in $first"))
      private var buf = HttpJson.objectValuesOf(first, "_source").iterator
      private var drained = false
      private def advance(): Unit =
        while (!buf.hasNext && !drained) {
          val resp = post(client, s"$base/_search/scroll",
            s"""{"scroll":"$keepAlive","scroll_id":"${JsonStr.escape(sid)}"}""",
            hdr)
          sid = HttpJson.stringValuesOf(resp, "_scroll_id").headOption
            .getOrElse(sid)
          val hits = HttpJson.objectValuesOf(resp, "_source")
          if (hits.isEmpty) {
            drained = true
            // clear the server-side context promptly (best effort)
            try post(client, s"$base/_search/scroll",
              s"""{"scroll_id":"${JsonStr.escape(sid)}"}""", hdr, "DELETE")
            catch { case _: java.io.IOException => () }
          } else buf = hits.iterator
        }
      override def hasNext: Boolean = { advance(); buf.hasNext }
      override def next(): String = { advance(); buf.next() }
    }
  }
}

final case class EsConnector(
    name: String,
    baseUrl: String,
    index: String,
    username: Option[String] = None,
    password: Option[String] = None,
    apiKey: Option[String] = None,
    batchSize: Int = 200,
    sliceCount: Int = 4,
    scrollPage: Int = 500,
    nowMillis: () => Long = () => System.currentTimeMillis()) extends Connector {

  override def withTarget(target: String): Connector = copy(index = target)

  /** `{yyyy}`/`{MM}`/`{dd}` expansion (elasticsearch.rs:210-218), UTC
    * like the reference's chrono::Utc.
    */
  private[graft] def expandIndex(atMillis: Long): String = {
    val d = java.time.Instant.ofEpochMilli(atMillis)
      .atZone(java.time.ZoneOffset.UTC)
    index
      .replace("{yyyy}", f"${d.getYear}%04d")
      .replace("{MM}", f"${d.getMonthValue}%02d")
      .replace("{dd}", f"${d.getDayOfMonth}%02d")
  }

  private def authHeader: Option[(String, String)] =
    apiKey.map(k => "Authorization" -> s"ApiKey $k")
      .orElse(for (u <- username; p <- password) yield
        "Authorization" -> ("Basic " + java.util.Base64.getEncoder
          .encodeToString(s"$u:$p".getBytes(UTF_8))))

  /** Batch read of the index via SLICED scroll — one independent
    * scroll per Spark partition (`"slice":{"id":i,"max":n}`), so a
    * 1000-executor cluster reads ES in parallel with zero driver
    * funneling: this is the es-hadoop distribution shape, and it
    * EXCEEDS the reference, whose ES connector is write-only
    * (elasticsearch.rs ships only ElasticsearchSink). Each task pages
    * lazily (`scrollPage` docs per request, bounded memory) and
    * clears its scroll context when drained. Pass `schema` — without
    * it, Spark's JSON schema inference re-runs the scroll for the
    * sampling pass.
    */
  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame = {
    val (url, idx, hdr) = (baseUrl, expandIndex(nowMillis()), authHeader)
    val (slices, page) = (math.max(1, sliceCount), scrollPage)
    val docs = spark.createDataset(
      spark.sparkContext.parallelize(0 until slices, slices)
        .flatMap(i => EsScroll.slice(url, idx, hdr, i, slices, page)))(
      org.apache.spark.sql.Encoders.STRING)
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(docs)
  }

  /** A search is a bounded snapshot — batch-only, like JDBC. Live
    * tailing of an index belongs to change-data tooling, not scroll.
    */
  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    throw new UnsupportedOperationException(
      "elasticsearch read is batch-only (a scroll is a point-in-time " +
        "snapshot); use read() or a CDC pipeline for live tailing")

  override def write(df: DataFrame): Unit = {
    val url = baseUrl.stripSuffix("/") + "/_bulk"
    val idx = expandIndex(nowMillis())
    val hdr = authHeader
    val chunk = batchSize
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      lazy val client = java.net.http.HttpClient.newHttpClient()
      it.grouped(chunk).foreach { docs =>
        val body = docs.iterator.map { d =>
          s"""{"index":{"_index":"$idx"}}""" + "\n" + d
        }.mkString("", "\n", "\n") // bulk bodies MUST end with \n
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .header("Content-Type", "application/x-ndjson")
        hdr.foreach { case (k, v) => b.header(k, v) }
        val resp = client.send(
          b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() / 100 != 2)
          throw new java.io.IOException(
            s"es bulk POST $url returned ${resp.statusCode()}: ${resp.body()}")
        // bulk returns 200 with per-item errors — check the flag
        if (resp.body().replaceAll("\\s", "").contains("\"errors\":true"))
          throw new java.io.IOException(
            s"es bulk POST $url rejected items: ${resp.body()}")
      }
    }
  }
}
