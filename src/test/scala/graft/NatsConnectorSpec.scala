package graft

import graft.sources.{NatsClient, NatsConnector, NatsSubscriber}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL networked NATS connector over loopback TCP: the wire
  * handshake (INFO → CONNECT), token auth rejection, pub/sub spool
  * into the landing dir + the Spark read over it, QUEUE-GROUP
  * load-balanced delivery, and the pipelined sink with its PING
  * flush barrier — including the full sink → subject → stream round
  * trip.
  */
class NatsConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("handshake + auth: token accepted, bad/missing token -ERRs") {
    val srv = new MiniNatsServer(requireToken = Some("sesame"))
    try {
      val ok = new NatsClient("127.0.0.1", srv.port, token = Some("sesame"))
      try ok.ping() finally ok.close()
      val bad = new NatsClient("127.0.0.1", srv.port, token = Some("wrong"))
      try {
        val e = intercept[java.io.IOException](bad.ping())
        assert(e.getMessage.contains("Authorization"))
      } finally bad.close()
      val none = new NatsClient("127.0.0.1", srv.port)
      try intercept[java.io.IOException](none.ping()) finally none.close()
    } finally srv.stop()
  }

  test("subscriber spools published JSON; non-JSON counted and skipped") {
    val srv = new MiniNatsServer()
    val dir = java.nio.file.Files.createTempDirectory("graft_nats_src_")
    try {
      val sub = NatsSubscriber.start("127.0.0.1", srv.port, "events",
        dir.toString)
      val pub = new NatsClient("127.0.0.1", srv.port)
      try {
        // subscribe() PING-barriers registration, so no warm-up race
        pub.publish("events", """{"id":1,"kind":"a","value":0.5}""")
        pub.publish("events", "{\n \"id\": 2,\n \"kind\": \"b\",\n \"value\": 1.5\n}")
        pub.publish("events", "not json")
        pub.publish("other.subject", """{"id":9}""")
        pub.ping() // server consumed all four
        assert(awaitTrue(2000)(sub.messageCount == 2 && sub.failureCount == 1),
          s"messages=${sub.messageCount} failures=${sub.failureCount}")
      } finally { pub.close(); sub.stop() }
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "a", 0.5), (2L, "b", 1.5)))
    } finally srv.stop()
  }

  test("queue group: each message lands on exactly ONE member") {
    val srv = new MiniNatsServer()
    val d1 = java.nio.file.Files.createTempDirectory("graft_nats_q1_")
    val d2 = java.nio.file.Files.createTempDirectory("graft_nats_q2_")
    try {
      val m1 = NatsSubscriber.start("127.0.0.1", srv.port, "work",
        d1.toString, queueGroup = Some("g"))
      val m2 = NatsSubscriber.start("127.0.0.1", srv.port, "work",
        d2.toString, queueGroup = Some("g"))
      val pub = new NatsClient("127.0.0.1", srv.port)
      try {
        (1 to 10).foreach(i => pub.publish("work", s"""{"id":$i}"""))
        pub.ping()
        assert(awaitTrue(2000)(m1.messageCount + m2.messageCount == 10),
          s"split=${m1.messageCount}/${m2.messageCount}")
        // load-balanced, not broadcast: both members got SOME work
        assert(m1.messageCount > 0 && m2.messageCount > 0)
      } finally { pub.close(); m1.stop(); m2.stop() }
      // no id was delivered twice across the group
      val ids = spark.read.json(d1.toString)
        .unionByName(spark.read.json(d2.toString))
        .collect().map(_.getAs[Long]("id")).toSeq
      assert(ids.sorted == (1L to 10L), s"got $ids")
    } finally srv.stop()
  }

  test("sink -> subject -> stream round trip over real loopback TCP") {
    val srv = new MiniNatsServer()
    val dir = java.nio.file.Files.createTempDirectory("graft_nats_rt_")
    try {
      val sub = NatsSubscriber.start("127.0.0.1", srv.port, "loop",
        dir.toString)
      val conn = NatsConnector("loop", "127.0.0.1", srv.port, "loop",
        dir.toString, batchSize = 2)
      import spark.implicits._
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in) // executor-side chunked PUBs, PING-sealed
      assert(awaitTrue(3000)(sub.messageCount == 3),
        s"messages=${sub.messageCount}")
      sub.stop()
      spark.sql("DROP VIEW IF EXISTS graft_nats_sink")
      val q = conn.readStream(spark, schema)
        .writeStream.format("memory").queryName("graft_nats_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("graft_nats_sink")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "click", 1.25), (2L, "buy", -0.5),
        (3L, "click", 3.0)))
    } finally srv.stop()
  }
}
