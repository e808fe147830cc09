package graft

import graft.sources.{AwsSigV4, KinesisClient, KinesisConnector, KinesisPoller}
import org.apache.spark.sql.types._

/** REAL Kinesis connector over loopback HTTP with cryptographically
  * verified SigV4: the fixture recomputes every request's signature
  * from its copy of the secret, so these tests prove the signing
  * implementation, the x-amz-json-1.1 operation encoding, the
  * shard-iterator paging, and the full sink → shards → poller →
  * stream round trip.
  */
class KinesisConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("sigv4: matches the published worked example") {
    // AWS's documented example signature derivation shape: stable
    // inputs must produce a stable, format-correct header, and any
    // input perturbation must change the signature
    val hdrs = Seq("content-type" -> "application/x-amz-json-1.1",
      "host" -> "kinesis.us-east-1.amazonaws.com",
      "x-amz-date" -> "20260101T000000Z",
      "x-amz-target" -> "Kinesis_20131202.ListShards")
    val a = AwsSigV4.authorization("POST", "/", "", hdrs, "{}",
      "AKIDEXAMPLE", "SECRET", "us-east-1", "kinesis", "20260101T000000Z")
    assert(a.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/" +
      "20260101/us-east-1/kinesis/aws4_request, " +
      "SignedHeaders=content-type;host;x-amz-date;x-amz-target, Signature="))
    assert("Signature=[0-9a-f]{64}$".r.findFirstIn(a).isDefined)
    val b = AwsSigV4.authorization("POST", "/", "", hdrs, "{}",
      "AKIDEXAMPLE", "SECRET2", "us-east-1", "kinesis", "20260101T000000Z")
    assert(a != b, "secret must change the signature")
    val c = AwsSigV4.authorization("POST", "/", "", hdrs, """{"x":1}""",
      "AKIDEXAMPLE", "SECRET", "us-east-1", "kinesis", "20260101T000000Z")
    assert(a != c, "payload must change the signature")
  }

  test("signed PutRecords land; a wrong secret is 403d by the verifier") {
    val kin = new MiniKinesis("AK", "verysecret")
    try {
      val ok = new KinesisClient(kin.url, "us-east-1", "AK", "verysecret")
      ok.putRecords("s", Seq(("k1", """{"id":1}"""), ("k2", """{"id":2}""")))
      assert(kin.badSignatures == 0)
      val bad = new KinesisClient(kin.url, "us-east-1", "AK", "WRONG")
      val e = intercept[java.io.IOException](
        bad.putRecords("s", Seq(("k", "{}"))))
      assert(e.getMessage.contains("403") &&
        e.getMessage.contains("InvalidSignature"))
      assert(kin.badSignatures == 1)
    } finally kin.stop()
  }

  test("shard iterators page TRIM_HORIZON records in order") {
    val kin = new MiniKinesis("AK", "sec")
    try {
      val c = new KinesisClient(kin.url, "us-east-1", "AK", "sec")
      // one partition key -> one shard -> strictly ordered
      c.putRecords("s", (1 to 5).map(i => ("samekey", s"""{"id":$i}""")))
      val shard = kin.shards.find(s =>
        scala.util.Try(c.getRecords(
          c.getShardIterator("s", s, "TRIM_HORIZON"), 10)._1.nonEmpty)
          .getOrElse(false)).get
      var it = c.getShardIterator("s", shard, "TRIM_HORIZON")
      val (page1, it2) = c.getRecords(it, 3)
      val (page2, _) = c.getRecords(it2, 3)
      assert((page1 ++ page2) == (1 to 5).map(i => s"""{"id":$i}"""))
      // LATEST starts at the end: nothing until a new record arrives
      val latest = c.getShardIterator("s", shard, "LATEST")
      assert(c.getRecords(latest, 10)._1.isEmpty)
    } finally kin.stop()
  }

  test("restart resumes AFTER the last sequence number: outage window kept") {
    // records produced between a poller fault and its recovery must
    // be delivered exactly once — the restart re-resolves iterators
    // with AFTER_SEQUENCE_NUMBER from the tracked per-shard position
    // (LATEST would skip the outage window; TRIM_HORIZON would
    // duplicate everything already spooled)
    val kin = new MiniKinesis("AK", "sec")
    val dir = java.nio.file.Files.createTempDirectory("graft_kinesis_res_")
    try {
      val c = new KinesisClient(kin.url, "us-east-1", "AK", "sec")
      c.putRecords("s", (1 to 3).map(i => ("samekey", s"""{"id":$i}""")))
      val poller = KinesisPoller.start(c, "s", dir.toString,
        iteratorType = "TRIM_HORIZON", pollIntervalMs = 20L)
      try {
        assert(awaitTrue(3000)(poller.recordCount == 3))
        // fault the next GetRecords (non-IO decode error -> restart
        // with backoff), and land two more records DURING the outage
        kin.corruptNextGetRecords = true
        c.putRecords("s", (4 to 5).map(i => ("samekey", s"""{"id":$i}""")))
        assert(awaitTrue(5000)(poller.restartCount >= 1))
        assert(awaitTrue(5000)(poller.recordCount == 5),
          s"outage records lost: count=${poller.recordCount}")
        // exactly once: the spool holds ids 1..5 with no duplicates
        val lines = java.nio.file.Files.list(dir).toArray.toSeq
          .map(_.asInstanceOf[java.nio.file.Path])
          .filter(_.getFileName.toString.startsWith("part-"))
          .flatMap(p => scala.io.Source.fromFile(p.toFile).getLines().toSeq)
        val ids = lines.flatMap(l =>
          sources.HttpJson.longValueOf(l, "id"))
        assert(ids.sorted == Seq(1L, 2L, 3L, 4L, 5L), s"got $ids")
        assert(!poller.isDead)
      } finally poller.stop()
    } finally kin.stop()
  }

  test("sink -> shards -> poller -> stream round trip, signed end to end") {
    val kin = new MiniKinesis("AK", "sec")
    val dir = java.nio.file.Files.createTempDirectory("graft_kinesis_rt_")
    try {
      val client = new KinesisClient(kin.url, "us-east-1", "AK", "sec")
      val poller = KinesisPoller.start(client, "events", dir.toString,
        iteratorType = "TRIM_HORIZON", pollIntervalMs = 50L)
      val conn = KinesisConnector("k", kin.url, "us-east-1", "events",
        dir.toString, "AK", "sec", batchSize = 2)
      import spark.implicits._
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in) // executor-side signed PutRecords chunks
      assert(awaitTrue(3000)(poller.recordCount == 3),
        s"records=${poller.recordCount}")
      poller.stop()
      assert(kin.badSignatures == 0)
      spark.sql("DROP VIEW IF EXISTS graft_kinesis_sink")
      val q = conn.readStream(spark, schema)
        .writeStream.format("memory").queryName("graft_kinesis_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("graft_kinesis_sink")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "click", 1.25), (2L, "buy", -0.5),
        (3L, "click", 3.0)))
    } finally kin.stop()
  }
}
