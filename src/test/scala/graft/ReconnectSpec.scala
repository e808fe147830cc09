package graft

import graft.sources._

/** Broker-restart resilience of every driver-side ingestion loop: the
  * broker is KILLED mid-stream (live connections closed) and
  * restarted on the same port; the subscriber/poller must reconnect
  * with backoff, resume spooling, report reconnectCount > 0 and stay
  * isDead=false — and a broker that never comes back must exhaust its
  * retries into a terminalError instead of hanging silently (the
  * ADVICE finding that motivated the flags).
  */
class ReconnectSpec extends SparkSpec {

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("MQTT subscriber survives a broker restart on the same port") {
    val srv1 = new MiniMqttBroker()
    val port = srv1.port
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_mqtt_")
    val sub = MqttSubscriber.start("127.0.0.1", port, "rc", dir.toString,
      timeoutMs = 500)
    try {
      val pub1 = new MqttClient("127.0.0.1", port, "rc-pub1")
      pub1.publish("rc", """{"id":1}""", qos = 0); pub1.ping()
      assert(awaitTrue(3000)(sub.messageCount == 1))
      srv1.stop() // kills the live subscriber connection
      val srv2 = new MiniMqttBroker(bindPort = port)
      try {
        assert(awaitTrue(10000)(sub.reconnectCount > 0),
          s"reconnects=${sub.reconnectCount} dead=${sub.isDead}")
        val pub2 = new MqttClient("127.0.0.1", port, "rc-pub2")
        pub2.publish("rc", """{"id":2}""", qos = 0); pub2.ping()
        pub2.close()
        assert(awaitTrue(5000)(sub.messageCount == 2),
          s"messages=${sub.messageCount}")
        assert(!sub.isDead)
      } finally srv2.stop()
    } finally sub.stop()
  }

  test("NATS subscriber survives a broker restart on the same port") {
    val srv1 = new MiniNatsServer()
    val port = srv1.port
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_nats_")
    val sub = NatsSubscriber.start("127.0.0.1", port, "rc", dir.toString,
      timeoutMs = 500)
    try {
      val pub1 = new NatsClient("127.0.0.1", port)
      pub1.publish("rc", """{"id":1}"""); pub1.ping()
      assert(awaitTrue(3000)(sub.messageCount == 1))
      srv1.stop()
      val srv2 = new MiniNatsServer(bindPort = port)
      try {
        assert(awaitTrue(10000)(sub.reconnectCount > 0),
          s"reconnects=${sub.reconnectCount} dead=${sub.isDead}")
        val pub2 = new NatsClient("127.0.0.1", port)
        pub2.publish("rc", """{"id":2}"""); pub2.ping()
        pub2.close()
        assert(awaitTrue(5000)(sub.messageCount == 2),
          s"messages=${sub.messageCount}")
        assert(!sub.isDead)
      } finally srv2.stop()
    } finally sub.stop()
  }

  test("Redis subscriber survives a server restart on the same port") {
    val srv1 = new MiniRedisServer()
    val port = srv1.port
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_redis_")
    val sub = RedisSubscriber.start("127.0.0.1", port, "rc", dir.toString,
      timeoutMs = 500)
    try {
      val pub1 = new RedisClient("127.0.0.1", port)
      pub1.publish("rc", """{"id":1}""")
      assert(awaitTrue(3000)(sub.messageCount == 1))
      pub1.close()
      srv1.stop()
      val srv2 = new MiniRedisServer(bindPort = port)
      try {
        assert(awaitTrue(10000)(sub.reconnectCount > 0),
          s"reconnects=${sub.reconnectCount} dead=${sub.isDead}")
        val pub2 = new RedisClient("127.0.0.1", port)
        pub2.publish("rc", """{"id":2}""")
        pub2.close()
        assert(awaitTrue(5000)(sub.messageCount == 2),
          s"messages=${sub.messageCount}")
        assert(!sub.isDead)
      } finally srv2.stop()
    } finally sub.stop()
  }

  test("Kafka poller survives a broker restart, resuming from its offsets") {
    val srv1 = new MiniKafkaBroker(numPartitions = 1)
    val port = srv1.port
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_kafka_")
    val pre = new KafkaClient("127.0.0.1", port)
    pre.partitions("rc")
    pre.produce("rc", 0, Seq((None, """{"id":1}""")))
    pre.close()
    val poller = KafkaPoller.start(
      () => new KafkaClient("127.0.0.1", port), "rc", dir.toString,
      startAt = "earliest", pollIntervalMs = 20L)
    try {
      assert(awaitTrue(3000)(poller.recordCount == 1))
      srv1.stop()
      // fresh broker on the same port: its log restarts at offset 0 —
      // the poller tracked offset 1, so it must re-discover cleanly
      // once a new record pushes the log past its mark
      val srv2 = new MiniKafkaBroker(numPartitions = 1, bindPort = port)
      try {
        assert(awaitTrue(10000)(poller.reconnectCount > 0),
          s"reconnects=${poller.reconnectCount} dead=${poller.isDead}")
        val live = new KafkaClient("127.0.0.1", port)
        live.partitions("rc")
        live.produce("rc", 0, Seq((None, """{"id":2}"""),
          (None, """{"id":3}""")))
        live.close()
        assert(awaitTrue(5000)(poller.recordCount >= 2),
          s"records=${poller.recordCount}")
        assert(!poller.isDead)
      } finally srv2.stop()
    } finally poller.stop()
  }

  test("a broker that never returns exhausts retries into terminalError") {
    val srv = new MiniNatsServer()
    val port = srv.port
    val dir = java.nio.file.Files.createTempDirectory("graft_rc_dead_")
    // 1 retry at 500 ms backoff: the test stays fast
    val sub = NatsSubscriber.start("127.0.0.1", port, "rc", dir.toString,
      timeoutMs = 500, maxReconnects = 1)
    try {
      srv.stop() // and never comes back
      assert(awaitTrue(15000)(sub.isDead), "retries must exhaust into dead")
      assert(sub.terminalError.isDefined)
    } finally sub.stop()
  }
}
