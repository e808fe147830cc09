package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** HTTP enrichment provider — the Spark-first re-expression of the
  * reference's per-event HTTP lookup
  * (varpulis-runtime/src/enrichment/http.rs: `GET base_url?key=K`,
  * JSON-object response, requested fields extracted; misses degrade).
  *
  * Where the reference fires one HTTP request per EVENT behind a TTL
  * cache (enrichment/cache.rs), the Spark shape batches: collect the
  * DISTINCT keys (bounded, loudly), fetch each key ONCE driver-side,
  * and broadcast-join the resulting lookup frame — one fetch per key
  * is exactly what a perfectly-warm cache would do, without per-row
  * network calls inside executors. The TTL half lives in
  * [[HttpEnrichment.TtlLookup]]: a streaming pipeline re-resolves the
  * lookup when it expires, so dim updates become visible within one
  * TTL (cache.rs expiry, re-expressed as periodic re-broadcast — see
  * StreamingSpec "dim update becomes visible after the TTL").
  */
object HttpEnrichment {

  /** Distinct-key cap — the reference cache's MAX_ENTRIES
    * (cache.rs:12). More distinct keys than a cache could ever hold
    * means this operator is being pointed at a fact column; fail
    * loudly instead of melting the enrichment service.
    */
  val MaxKeys: Int = 100000

  // shared client + mapper (thread-safe for readTree); explicit
  // timeouts so a black-holed endpoint surfaces as a miss, not a
  // permanently-parked fetch thread
  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Fetch one key: `GET/POST base?key=K` → Some(field values, in
    * `fields` order, null per absent field) or None on non-2xx /
    * unparsable body (http.rs NotFound/Parse — a miss, not an error).
    */
  private[sources] def fetchOne(base: String, key: String,
      fields: Seq[String], method: String,
      headers: Map[String, String]): Option[Seq[String]] = {
    val sep = if (base.contains('?')) '&' else '?'
    val url = s"$base${sep}key=${java.net.URLEncoder.encode(key, "UTF-8")}"
    val b = HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(10))
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = (if (method.equalsIgnoreCase("POST"))
      b.POST(HttpRequest.BodyPublishers.noBody()) else b.GET()).build()
    // Try absorbs IO errors AND timeouts — a dead/hung endpoint for
    // one key is a miss (http.rs NotFound degrades the same way)
    val resp = Try(http.send(req, HttpResponse.BodyHandlers.ofString()))
      .toOption.filter(r => r.statusCode() >= 200 && r.statusCode() < 300)
    resp.flatMap { r =>
      Try(mapper.readTree(r.body())).toOption
        .filter(n => n != null && n.isObject)
        .map { node =>
          fields.map { f =>
            val v = node.get(f)
            if (v == null || v.isNull) null
            else if (v.isTextual) v.asText()
            else v.toString
          }
        }
    }
  }

  /** Build a lookup DataFrame by fetching every distinct key once.
    * Schema: `keyName` STRING + one STRING column per field (JSON
    * scalars rendered as text — the join side casts; the reference's
    * Value conversion is equally dynamic). Keys that miss are simply
    * absent, so the downstream left join degrades them to
    * fallback/NULL exactly like an unbound connector.
    */
  def lookup(spark: SparkSession, baseUrl: String, keyName: String,
      keys: Seq[String], fields: Seq[String], method: String = "GET",
      headers: Map[String, String] = Map.empty): DataFrame = {
    val distinctKeys = keys.distinct
    require(distinctKeys.size <= MaxKeys,
      s"http enrichment: ${distinctKeys.size} distinct keys exceed " +
        s"the $MaxKeys cap (cache.rs MAX_ENTRIES) — the key column " +
        "looks like a fact, not a dimension")
    // a bounded driver-side fetch pool: enrichment dims are small by
    // construction (the cap above); 8-way keeps a slow endpoint from
    // serializing the whole dim fetch
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
      r => { val t = new Thread(r, "graft-enrich-http"); t.setDaemon(true); t })
    val rows =
      try {
        import scala.jdk.CollectionConverters._
        val tasks = distinctKeys.map { k =>
          pool.submit(new java.util.concurrent.Callable[Option[Row]] {
            override def call(): Option[Row] =
              fetchOne(baseUrl, k, fields, method, headers)
                .map(vs => Row.fromSeq(k +: vs))
          })
        }
        tasks.flatMap(_.get(120, java.util.concurrent.TimeUnit.SECONDS)).asJava
      } finally pool.shutdownNow() // interrupt stragglers, not just refuse new
    val schema = StructType(StructField(keyName, StringType) +:
      fields.map(f => StructField(f, StringType)))
    spark.createDataFrame(rows, schema)
  }

  /** TTL-cached lookup frame for long-running streams — the
    * enrichment cache's expiry semantics (cache.rs EnrichmentCache)
    * at dataframe granularity: `current()` returns the cached frame
    * until `ttlMs` passes, then re-runs `fetch` so the next
    * micro-batch joins against the refreshed dim. Use from
    * foreachBatch (one call per micro-batch, any thread).
    */
  final class TtlLookup(fetch: () => DataFrame, ttlMs: Long) {
    @volatile private var cached: DataFrame = null
    @volatile private var fetchedAt = 0L
    @volatile private var refreshCount = 0L

    def current(): DataFrame = {
      val now = System.nanoTime() / 1000000L
      if (cached == null || now - fetchedAt >= ttlMs) synchronized {
        val now2 = System.nanoTime() / 1000000L
        if (cached == null || now2 - fetchedAt >= ttlMs) {
          cached = fetch()
          fetchedAt = now2
          refreshCount += 1
        }
      }
      cached
    }

    /** How many times the dim has actually been (re)fetched. */
    def refreshes: Long = refreshCount
  }
}
