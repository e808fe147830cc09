package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The staged events table has shipped with two physical `ts`
  * encodings — ns-epoch INT64 (read as LONG under `nanosAsLong`) and
  * µs `timestamp[us] isAdjustedToUTC=false` (read as TIMESTAMP_NTZ).
  * The r6 driver regeneration switched encodings mid-build and every
  * event-time query died at analysis; this spec pins the loader
  * boundary (`Tables.normalizeTs` + the closed-stream sentinel writer)
  * so BOTH encodings keep producing identical TIMESTAMP values, in
  * batch and in streaming, no matter which one the upstream writer
  * picks next.
  */
class TsEncodingSpec extends SparkSpec {

  /** The driver stages each table as a single parquet FILE (not a
    * directory) — the stream stagers symlink that file, so fixtures
    * must match the real layout.
    */
  private def writeSingleFile(df: org.apache.spark.sql.DataFrame,
      dest: java.nio.file.Path): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ts_w_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).filter(p =>
      p.getFileName.toString.endsWith(".parquet")).findFirst.get
    java.nio.file.Files.move(part, dest)
  }

  /** One tiny events table, staged under both encodings. Timestamps
    * are µs-round so the ns→µs floor division and the native µs file
    * must agree bit-for-bit.
    */
  private lazy val (longDir, ntzDir): (String, String) = {
    val rows = spark.range(200L).selectExpr(
      "id AS event_id",
      // 2024-01-01T00:00:00Z + id minutes, as µs since epoch
      s"${1704067200L * 1000000L} + id * 60000000 AS ts_us",
      "id % 7 AS user_id",
      "CASE WHEN id % 3 = 0 THEN 'signup' ELSE 'purchase' END AS event_type",
      "cast(id % 10 as double) AS value",
      "'{}' AS props")
    val a = java.nio.file.Files.createTempDirectory("graft_ts_long_")
    writeSingleFile(
      rows.selectExpr("event_id", "ts_us * 1000 AS ts", "user_id",
        "event_type", "value", "props"),
      a.resolve("events.parquet"))
    val b = java.nio.file.Files.createTempDirectory("graft_ts_ntz_")
    writeSingleFile(
      rows.selectExpr("event_id",
        "cast(timestamp_micros(ts_us) as timestamp_ntz) AS ts", "user_id",
        "event_type", "value", "props"),
      b.resolve("events.parquet"))
    (a.toString, b.toString)
  }

  test("ntz staging really reads back as TIMESTAMP_NTZ") {
    val f = spark.read.parquet(s"$ntzDir/events.parquet").schema("ts")
    assert(f.dataType == TimestampNTZType)
  }

  test("normalizeTs yields identical TIMESTAMP values from both encodings") {
    val a = Tables.normalizeTs(spark.read.parquet(s"$longDir/events.parquet"))
    val b = Tables.normalizeTs(spark.read.parquet(s"$ntzDir/events.parquet"))
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val va = a.select("event_id", "ts").orderBy("event_id").collect()
    val vb = b.select("event_id", "ts").orderBy("event_id").collect()
    assert(va.sameElements(vb))
  }

  test("windowed aggregation agrees across encodings") {
    def agg(dir: String) =
      Tables.normalizeTs(spark.read.parquet(s"$dir/events.parquet"))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
        .select(col("window.start").cast("long").as("start"),
          col("event_type"), col("n"), col("s"))
        .orderBy("event_type", "start").collect().toSeq
    assert(agg(longDir) == agg(ntzDir))
  }

  test("normalizeEvents absorbs narrowed id/value physical types") {
    // the NTZ incident generalized: an upstream writer switching to
    // int32 ids / float32 value must be a loader-level no-event
    val c = java.nio.file.Files.createTempDirectory("graft_ts_narrow_")
    val narrow = spark.read.parquet(s"$ntzDir/events.parquet")
      .selectExpr("cast(event_id as int) AS event_id", "ts",
        "cast(user_id as int) AS user_id", "event_type",
        "cast(value as float) AS value", "props")
    writeSingleFile(narrow, c.resolve("events.parquet"))
    val got = Tables.normalizeEvents(
      spark.read.parquet(s"$c/events.parquet"))
    assert(got.schema("event_id").dataType == LongType)
    assert(got.schema("user_id").dataType == LongType)
    assert(got.schema("value").dataType == DoubleType)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.count() == 200L)
    // and the closed-stream stager writes a sentinel matching the
    // narrowed source schema (one parquet schema across the dir)
    val s = graft.streaming.StreamingQueries.streamSliding(spark, c.toString)
    assert(s.count() > 0)
  }

  test("documents loader absorbs narrowed stagings end-to-end") {
    // same portability contract for the documents table: an int32
    // doc_id / int32 n_chars staging must change nothing — batch
    // queries read through Tables (canonical bigint), and the TYPED
    // streaming path (packStream's PkIn case class takes Longs, the
    // exact shape the r6 class of incident crashes) runs green over
    // the narrowed staging and matches the batch packing row for row.
    val dir = java.nio.file.Files.createTempDirectory("graft_doc_narrow_")
    val narrow = Tables(spark, sf).documents.limit(120)
      .selectExpr("cast(doc_id as int) AS doc_id", "text", "lang",
        "source", "cast(n_chars as int) AS n_chars")
    writeSingleFile(narrow, dir.resolve("documents.parquet"))
    val got = Tables(spark, dir.toString).documents
    assert(got.schema("doc_id").dataType == LongType)
    assert(got.schema("n_chars").dataType == LongType)
    assert(got.count() == 120L)
    val streamed = graft.streaming.StreamingQueries
      .streamPack(spark, dir.toString)
      .orderBy("shard", "doc_id").collect().toSeq
    val batch = graft.text.TextAnalysis.packSequences(
      got, col("doc_id"), col("text"), nShards = 64, budgetTokens = 256L)
      .orderBy("shard", "doc_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("closed-stream sentinel path works for both encodings") {
    // streamSliding goes through closedStreamDir, which must write its
    // end-of-stream sentinel in the SAME physical ts type as the
    // source — for either encoding
    val a = graft.streaming.StreamingQueries.streamSliding(spark, longDir)
      .orderBy("event_type", "win_start").collect().toSeq
    val b = graft.streaming.StreamingQueries.streamSliding(spark, ntzDir)
      .orderBy("event_type", "win_start").collect().toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }
}
