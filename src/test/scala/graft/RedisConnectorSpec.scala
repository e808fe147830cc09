package graft

import graft.sources.{RedisClient, RedisConnector, RedisSubscriber, Resp}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL networked Redis connector over loopback TCP: RESP framing,
  * SET/GET with key prefix, the driver-side SUBSCRIBE spool into a
  * landing dir + Spark read over it, and the pipelined executor-side
  * PUBLISH sink — including the full sink → pub/sub → stream round
  * trip that mirrors HttpConnectorSpec's.
  */
class RedisConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  /** Conditions may have side effects (a probe PUBLISH), so each
    * evaluation happens exactly once per poll — no trailing re-check.
    */
  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("RESP client: PING, SET/GET, null bulk, error reply, key prefix") {
    val srv = new MiniRedisServer
    try {
      val c = new RedisClient("127.0.0.1", srv.port)
      try {
        assert(c.ping())
        c.set("k1", """{"v":1}""")
        assert(c.get("k1").contains("""{"v":1}"""))
        assert(c.get("absent").isEmpty) // $-1 null bulk
        // server -ERR surfaces as an exception on the client
        val e = intercept[java.io.IOException](c.command("NOPE"))
        assert(e.getMessage.contains("unknown command"))
      } finally c.close()
      // key prefix through the connector (reference redis.rs:166-177)
      val conn = RedisConnector("r", "127.0.0.1", srv.port, "ch",
        spoolDir = "/tmp/unused_redis_spool", keyPrefix = Some("dim"))
      conn.set("u1", "gold")
      assert(conn.get("u1").contains("gold"))
      val raw = new RedisClient("127.0.0.1", srv.port)
      try assert(raw.get("dim:u1").contains("gold")) // prefixed on the wire
      finally raw.close()
    } finally srv.stop()
  }

  test("subscriber spools published JSON; non-JSON counted and skipped") {
    val srv = new MiniRedisServer
    val dir = java.nio.file.Files.createTempDirectory("graft_redis_src_")
    try {
      val sub = RedisSubscriber.start("127.0.0.1", srv.port, "events",
        dir.toString)
      val pub = new RedisClient("127.0.0.1", srv.port)
      try {
        // messages published BEFORE any subscriber exist are gone —
        // pub/sub is transient; this one must deliver to 1 subscriber
        assert(awaitTrue(2000)(pub.publish("events",
          """{"id":1,"kind":"a","value":0.5}""") == 1L))
        // pretty-printed (raw newlines) must land as ONE NDJSON line
        pub.publish("events",
          "{\n  \"id\": 2,\n  \"kind\": \"b\",\n  \"value\": 1.5\n}")
        pub.publish("events", "not json") // warned+skipped in reference
        pub.publish("other-channel", """{"id":9}""") // not subscribed
        assert(awaitTrue(2000)(sub.messageCount == 2 && sub.failureCount == 1),
          s"messages=${sub.messageCount} failures=${sub.failureCount}")
      } finally { pub.close(); sub.stop() }
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "a", 0.5), (2L, "b", 1.5)))
    } finally srv.stop()
  }

  test("sink -> pub/sub -> stream round trip over real loopback TCP") {
    val srv = new MiniRedisServer
    val dir = java.nio.file.Files.createTempDirectory("graft_redis_rt_")
    try {
      val sub = RedisSubscriber.start("127.0.0.1", srv.port, "loop",
        dir.toString)
      // wait until the SUBSCRIBE registered server-side
      val probe = new RedisClient("127.0.0.1", srv.port)
      try assert(awaitTrue(2000)(probe.publish("loop", """{"id":0,"kind":"warm","value":0.0}""") == 1L))
      finally probe.close()

      val conn = RedisConnector("loop", "127.0.0.1", srv.port, "loop",
        dir.toString, batchSize = 2) // chunked pipeline: 3 rows -> 2 chunks
      import spark.implicits._
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in) // executor-side pipelined PUBLISHes
      assert(awaitTrue(3000)(sub.messageCount == 4),
        s"messages=${sub.messageCount}")
      sub.stop()

      spark.sql("DROP VIEW IF EXISTS graft_redis_sink")
      val q = conn.readStream(spark, schema)
        .writeStream.format("memory").queryName("graft_redis_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("graft_redis_sink").where(col("id") > 0)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "click", 1.25), (2L, "buy", -0.5),
        (3L, "click", 3.0)))
    } finally srv.stop()
  }

  test("VPL .to(Cache) publishes the stream's output over real TCP") {
    import graft.vpl._
    val srv = new MiniRedisServer
    val dir = java.nio.file.Files.createTempDirectory("graft_redis_vpl_")
    try {
      val sub = RedisSubscriber.start("127.0.0.1", srv.port, "out",
        dir.toString)
      val probe = new RedisClient("127.0.0.1", srv.port)
      try assert(awaitTrue(2000)(
        probe.publish("out", """{"k":0,"v":0.0}""") == 1L))
      finally probe.close()
      val vpl =
        """stream Out = Ping
          |    .where(v > 1.0)
          |    .emit(k: k, v: v)
          |    .to(Cache)
          |""".stripMargin
      val evt = java.nio.file.Files.createTempFile("graft_redis_vpl", ".evt")
      java.nio.file.Files.writeString(evt,
        """Ping { k: 1, v: 2.0 }
          |Ping { k: 2, v: 0.5 }
          |Ping { k: 3, v: 4.0 }
          |""".stripMargin)
      val prog = VplParser.parse(vpl)
      val decls = prog.events.map(e => e.name -> e).toMap
      new VplCompiler(prog, new EvtSource(spark, Seq(evt.toString), decls),
        sinks = Map("Cache" -> RedisConnector(
          "Cache", "127.0.0.1", srv.port, "out", dir.toString)))
        .compileAllStrict()
      // program rows went over the wire, landed via the subscriber
      assert(awaitTrue(3000)(sub.messageCount == 3),
        s"messages=${sub.messageCount}")
      sub.stop()
      val landed = spark.read.json(dir.toString)
        .where(col("k") > 0).collect().map(_.getAs[Long]("k")).toSet
      assert(landed == Set(1L, 3L))
    } finally srv.stop()
  }

  test("pipeline batches N commands into one flush with N replies") {
    val srv = new MiniRedisServer
    try {
      val c = new RedisClient("127.0.0.1", srv.port)
      try {
        val replies = c.pipeline(Seq(
          Seq("SET", "a", "1"), Seq("SET", "b", "2"), Seq("GET", "a"),
          Seq("PUBLISH", "nobody", "x")))
        assert(replies == Seq(Resp.RSimple("OK"), Resp.RSimple("OK"),
          Resp.RBulk(Some("1")), Resp.RInt(0)))
      } finally c.close()
    } finally srv.stop()
  }
}
