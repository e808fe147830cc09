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
  * es-hadoop connector does. Write-only, like the reference
  * (ElasticsearchSink has no source half).
  */
final case class EsConnector(
    name: String,
    baseUrl: String,
    index: String,
    username: Option[String] = None,
    password: Option[String] = None,
    apiKey: Option[String] = None,
    batchSize: Int = 200,
    nowMillis: () => Long = () => System.currentTimeMillis()) extends Connector {

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

  override def read(spark: SparkSession, schema: Option[StructType]): DataFrame =
    throw new UnsupportedOperationException(
      "elasticsearch connector is write-only (reference ElasticsearchSink)")

  override def readStream(spark: SparkSession, schema: StructType): DataFrame =
    throw new UnsupportedOperationException(
      "elasticsearch connector is write-only (reference ElasticsearchSink)")

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
