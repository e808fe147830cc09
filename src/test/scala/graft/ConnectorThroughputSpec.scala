package graft

import graft.sources._

/** Measures the DRIVER-SIDE spool ceiling of each single-connection
  * ingestion path on loopback — the number a 100 TB deployment needs
  * in order to know when to switch to the executor-parallel binding
  * (spark-sql-kafka, kinesis-sql, bahir-mqtt). Rates are printed via
  * info() and recorded in the connector scaladoc + SURVEY §2 #33;
  * assertions cover DELIVERY only (all messages arrive, none lost),
  * never the rate itself, so host noise cannot flake the suite.
  *
  * Methodology: publish N pre-serialized JSON events through the
  * product sink path, await full spool, report N / elapsed. Loopback
  * removes network latency, so these are UPPER bounds for the spool
  * machinery itself (framing + parse + atomic NDJSON write).
  */
class ConnectorThroughputSpec extends SparkSpec {

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(10); ok = cond }
    ok
  }

  private def msg(i: Int): String = s"""{"id":$i,"kind":"t","value":$i.5}"""

  test("NATS spool ceiling (loopback)") {
    val srv = new MiniNatsServer()
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_nats_")
    try {
      val sub = NatsSubscriber.start("127.0.0.1", srv.port, "tp", dir.toString)
      val pub = new NatsClient("127.0.0.1", srv.port)
      val n = 20000
      val t0 = System.nanoTime()
      try {
        (0 until n).grouped(1000).foreach(g =>
          pub.publishAll("tp", g.map(msg).toSeq))
        assert(awaitTrue(30000)(sub.messageCount == n),
          s"spooled ${sub.messageCount}/$n")
      } finally { pub.close(); sub.stop() }
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"NATS subscriber spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
    } finally srv.stop()
  }

  test("Redis SUBSCRIBE spool ceiling (loopback)") {
    val srv = new MiniRedisServer()
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_redis_")
    try {
      val sub = RedisSubscriber.start("127.0.0.1", srv.port, "tp", dir.toString)
      val pub = new RedisClient("127.0.0.1", srv.port)
      val n = 20000
      val t0 = System.nanoTime()
      try {
        (0 until n).grouped(1000).foreach(g =>
          pub.pipeline(g.map(i => Seq("PUBLISH", "tp", msg(i))).toSeq))
        assert(awaitTrue(30000)(sub.messageCount == n),
          s"spooled ${sub.messageCount}/$n")
      } finally { pub.close(); sub.stop() }
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"Redis subscriber spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
    } finally srv.stop()
  }

  test("MQTT spool ceiling (loopback, QoS 0)") {
    val srv = new MiniMqttBroker()
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_mqtt_")
    try {
      val sub = MqttSubscriber.start("127.0.0.1", srv.port, "tp", dir.toString)
      val pub = new MqttClient("127.0.0.1", srv.port, "tp-pub")
      val n = 10000
      val t0 = System.nanoTime()
      try {
        (0 until n).grouped(1000).foreach(g =>
          pub.publishAll("tp", g.map(msg).toSeq, qos = 0))
        assert(awaitTrue(30000)(sub.messageCount == n),
          s"spooled ${sub.messageCount}/$n")
      } finally { pub.close(); sub.stop() }
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"MQTT subscriber spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
    } finally srv.stop()
  }

  test("Kafka poller spool ceiling (loopback)") {
    val srv = new MiniKafkaBroker(numPartitions = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_kafka_")
    try {
      val pre = new KafkaClient("127.0.0.1", srv.port)
      val n = 20000
      try {
        pre.partitions("tp")
        (0 until n).grouped(500).zipWithIndex.foreach { case (g, c) =>
          pre.produce("tp", c % 2, g.map(i => (None, msg(i))).toSeq)
        }
      } finally pre.close()
      val t0 = System.nanoTime()
      val poller = KafkaPoller.start(
        () => new KafkaClient("127.0.0.1", srv.port), "tp", dir.toString,
        startAt = "earliest", pollIntervalMs = 5L)
      try {
        assert(awaitTrue(30000)(poller.recordCount == n),
          s"spooled ${poller.recordCount}/$n")
        val sec = (System.nanoTime() - t0) / 1e9
        info(f"Kafka poller spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
      } finally poller.stop()
    } finally srv.stop()
  }

  test("Kafka poller spool ceiling, zstd-compressed topic (loopback)") {
    // same drive as the uncompressed ceiling, but the producer
    // compresses each batch zstd (codec 4) AND the broker re-serves
    // zstd on fetch — the poller pays CRC + zstd decode per batch, so
    // this measures the compressed-topic consumption ceiling end to
    // end
    val srv = new MiniKafkaBroker(numPartitions = 2)
    srv.zstdFetch = true
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_kzstd_")
    try {
      val pre = new KafkaClient("127.0.0.1", srv.port,
        produceCodec = "zstd")
      val n = 20000
      try {
        pre.partitions("tpz")
        (0 until n).grouped(500).zipWithIndex.foreach { case (g, c) =>
          pre.produce("tpz", c % 2, g.map(i => (None, msg(i))).toSeq)
        }
      } finally pre.close()
      val t0 = System.nanoTime()
      val poller = KafkaPoller.start(
        () => new KafkaClient("127.0.0.1", srv.port), "tpz", dir.toString,
        startAt = "earliest", pollIntervalMs = 5L)
      try {
        assert(awaitTrue(30000)(poller.recordCount == n),
          s"spooled ${poller.recordCount}/$n")
        val sec = (System.nanoTime() - t0) / 1e9
        info(f"Kafka zstd poller spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
      } finally poller.stop()
    } finally srv.stop()
  }

  test("Kinesis poller spool ceiling (loopback)") {
    val kin = new MiniKinesis("AK", "sec")
    val dir = java.nio.file.Files.createTempDirectory("graft_tp_kin_")
    try {
      val client = new KinesisClient(kin.url, "us-east-1", "AK", "sec")
      val n = 5000
      (0 until n).grouped(500).foreach(g =>
        client.putRecords("tp", g.map(i => (s"pk$i", msg(i))).toSeq))
      val t0 = System.nanoTime()
      val poller = KinesisPoller.start(client, "tp", dir.toString,
        iteratorType = "TRIM_HORIZON", batchSize = 1000, pollIntervalMs = 5L)
      try {
        assert(awaitTrue(30000)(poller.recordCount == n),
          s"spooled ${poller.recordCount}/$n")
        val sec = (System.nanoTime() - t0) / 1e9
        info(f"Kinesis poller spool: $n msgs in $sec%.2fs = ${n / sec}%.0f msg/s")
      } finally poller.stop()
    } finally kin.stop()
  }
}
