package graft

import graft.sources.{MqttClient, MqttConnector, MqttSubscriber}
import org.apache.spark.sql.types._

/** REAL networked MQTT 3.1.1 connector over loopback TCP: binary
  * packet framing (CONNECT/CONNACK, SUBSCRIBE/SUBACK,
  * PUBLISH/PUBACK, PING), auth return codes, QoS-1 acknowledged
  * publishing, wildcard subscription, and the full sink → topic →
  * stream round trip.
  */
class MqttConnectorSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("CONNACK auth codes: accepted / bad credentials / not authorized") {
    val broker = new MiniMqttBroker(requireUser = Some(("u", "p")))
    try {
      val ok = new MqttClient("127.0.0.1", broker.port, "c1",
        username = Some("u"), password = Some("p"))
      try ok.ping() finally ok.close()
      val bad = intercept[java.io.IOException] {
        new MqttClient("127.0.0.1", broker.port, "c2",
          username = Some("u"), password = Some("wrong"))
      }
      assert(bad.getMessage.contains("bad user name or password"))
      val anon = intercept[java.io.IOException] {
        new MqttClient("127.0.0.1", broker.port, "c3")
      }
      assert(anon.getMessage.contains("not authorized"))
    } finally broker.stop()
  }

  test("subscriber spools published JSON; non-JSON counted; wildcard") {
    val broker = new MiniMqttBroker()
    val dir = java.nio.file.Files.createTempDirectory("graft_mqtt_src_")
    try {
      // '#' wildcard subscription sees every sensors/* topic
      val sub = MqttSubscriber.start("127.0.0.1", broker.port, "sensors/#",
        dir.toString)
      val pub = new MqttClient("127.0.0.1", broker.port, "pub")
      try {
        pub.publish("sensors/a", """{"id":1,"kind":"a","value":0.5}""")
        pub.publish("sensors/b",
          "{\n \"id\": 2,\n \"kind\": \"b\",\n \"value\": 1.5\n}")
        pub.publish("sensors/a", "not json")
        pub.publish("other/topic", """{"id":9}""")
        pub.ping() // broker consumed all four
        assert(awaitTrue(2000)(sub.messageCount == 2 && sub.failureCount == 1),
          s"messages=${sub.messageCount} failures=${sub.failureCount}")
      } finally { pub.close(); sub.stop() }
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "a", 0.5), (2L, "b", 1.5)))
    } finally broker.stop()
  }

  test("QoS 1: every publish PUBACKed; QoS 2 rejected with guidance") {
    val broker = new MiniMqttBroker()
    try {
      val c = new MqttClient("127.0.0.1", broker.port, "q1")
      try {
        c.publishAll("t", (1 to 5).map(i => s"""{"id":$i}"""), qos = 1)
        // publishAll at QoS 1 returns only after 5 PUBACKs — if the
        // broker had dropped one, the call would have timed out
        assert(broker.publishesSeen == 5)
        val e = intercept[IllegalArgumentException](
          c.publish("t", "{}", qos = 2))
        assert(e.getMessage.contains("QoS 2 not supported"))
      } finally c.close()
    } finally broker.stop()
  }

  test("shared subscription: $share group splits the topic across members") {
    // the documented scale-out path past one subscriber's spool
    // ceiling: $share/<group>/<topic> members each receive a DISJOINT
    // subset (the de-facto 3.1.1 broker extension, standardized in
    // MQTT 5) — the MQTT twin of NATS queue groups
    val srv = new MiniMqttBroker()
    val d1 = java.nio.file.Files.createTempDirectory("graft_mqtt_sh1_")
    val d2 = java.nio.file.Files.createTempDirectory("graft_mqtt_sh2_")
    try {
      val m1 = MqttSubscriber.start("127.0.0.1", srv.port,
        "$share/g/work", d1.toString, clientId = "m1")
      val m2 = MqttSubscriber.start("127.0.0.1", srv.port,
        "$share/g/work", d2.toString, clientId = "m2")
      val pub = new MqttClient("127.0.0.1", srv.port, "sh-pub")
      try {
        (1 to 10).foreach(i => pub.publish("work", s"""{"id":$i}"""))
        pub.ping()
        assert(awaitTrue(3000)(m1.messageCount + m2.messageCount == 10),
          s"split=${m1.messageCount}/${m2.messageCount}")
        // load-balanced, not broadcast: both members got SOME work
        assert(m1.messageCount > 0 && m2.messageCount > 0)
      } finally { pub.close(); m1.stop(); m2.stop() }
      // no id delivered twice across the group
      val ids = spark.read.json(d1.toString)
        .unionByName(spark.read.json(d2.toString))
        .collect().map(_.getAs[Long]("id")).toSeq
      assert(ids.sorted == (1L to 10L), s"got $ids")
    } finally srv.stop()
  }

  test("sink -> topic -> stream round trip over real loopback TCP") {
    val broker = new MiniMqttBroker()
    val dir = java.nio.file.Files.createTempDirectory("graft_mqtt_rt_")
    try {
      val sub = MqttSubscriber.start("127.0.0.1", broker.port, "loop",
        dir.toString)
      val conn = MqttConnector("loop", "127.0.0.1", broker.port, "loop",
        dir.toString, qos = 1, batchSize = 2)
      import spark.implicits._
      val in = Seq((1L, "click", 1.25), (2L, "buy", -0.5), (3L, "click", 3.0))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in) // executor-side chunked QoS-1 publishes
      assert(awaitTrue(3000)(sub.messageCount == 3),
        s"messages=${sub.messageCount}")
      sub.stop()
      spark.sql("DROP VIEW IF EXISTS graft_mqtt_sink")
      val q = conn.readStream(spark, schema)
        .writeStream.format("memory").queryName("graft_mqtt_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("graft_mqtt_sink")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((1L, "click", 1.25), (2L, "buy", -0.5),
        (3L, "click", 3.0)))
    } finally broker.stop()
  }
}
