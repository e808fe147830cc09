package graft

import org.apache.spark.sql.functions._

/** The observability surface (SURVEY §2 — reference metrics.rs
  * analogue): per-query batch counters from the
  * QueryExecutionListener hook, per-stream counters from the
  * StreamingQueryListener hook, the graft_metrics temp view, and the
  * Prometheus text exposition.
  */
class MetricsSpec extends SparkSpec {

  test("batch counters: executions, output rows, scan rows/bytes, duration") {
    val m = graft.metrics.GraftMetrics.attach(spark)
    try {
      m.recordQuery("q1_agg") {
        SparkEntry.queries("q1_agg")(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
      val t = m.table().collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
        .toMap
      assert(t(("query", "q1_agg", "executions_total")) >= 1.0)
      assert(t(("query", "q1_agg", "scan_rows_total")) > 0.0,
        "lineitem scan rows must be counted")
      assert(t(("query", "q1_agg", "scan_bytes_total")) > 0.0)
      assert(t(("query", "q1_agg", "duration_seconds_total")) > 0.0)
      assert(t(("query", "q1_agg", "failures_total")) == 0.0)
      // queryable like any table — the Spark-native surface
      assert(spark.sql(
        """SELECT value FROM graft_metrics
          |WHERE kind = 'query' AND name = 'q1_agg'
          |  AND metric = 'executions_total'""".stripMargin)
        .head().getDouble(0) >= 1.0)
      val prom = m.gather()
      assert(prom.contains("""graft_queries_total{query="q1_agg"}"""))
      assert(prom.contains("graft_active_streams 0.0"))
    } finally m.detach()
  }

  test("streaming counters: batches, input/sink rows, active gauge") {
    val m = graft.metrics.GraftMetrics.attach(spark)
    try {
      val n = Tables(spark, sf).events.count()
      // staged synchronous run to a memory sink (s12's plan)
      graft.streaming.StreamingQueries.streamDedup(spark, sf)
      m.sync()
      val t = m.table().collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
        .toMap
      assert(t(("stream", "graft_s12_sink", "batches_total")) >= 1.0)
      assert(t(("stream", "graft_s12_sink", "input_rows_total")) == n.toDouble,
        "every staged event must be counted on ingest")
      assert(t(("stream", "graft_s12_sink", "sink_rows_total")) > 0.0)
      assert(t(("engine", "", "active_streams")) == 0.0,
        "terminated streams leave the gauge")
      val prom = m.gather()
      assert(prom.contains(
        """graft_stream_input_rows_total{stream="graft_s12_sink"}"""))
    } finally m.detach()
  }

  test("scrape endpoint serves the Prometheus exposition over HTTP") {
    val m = graft.metrics.GraftMetrics.attach(spark)
    val srv = graft.metrics.MetricsServer.start(m, port = 0)
    try {
      m.recordQuery("scrape_probe") {
        spark.range(5).select(sum(col("id"))).collect()
      }
      val url = new java.net.URI(
        s"http://127.0.0.1:${srv.port}/metrics").toURL
      val conn = url.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      val body = try {
        assert(conn.getResponseCode == 200)
        assert(conn.getContentType.startsWith("text/plain"))
        new String(conn.getInputStream.readAllBytes(), "UTF-8")
      } finally conn.disconnect()
      assert(body.contains("""graft_queries_total{query="scrape_probe"}"""))
      assert(body.contains("graft_active_streams"))
      // true miss AND a prefix-match miss (JDK contexts route by
      // prefix — /metricsfoo must not serve the metrics body)
      for (path <- Seq("/nope", "/metricsfoo")) {
        val miss = new java.net.URI(s"http://127.0.0.1:${srv.port}$path")
          .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        try assert(miss.getResponseCode == 404, path)
        finally miss.disconnect()
      }
    } finally { srv.stop(); m.detach() }
  }

  test("concurrent tagged queries on separate threads attribute correctly") {
    val m = graft.metrics.GraftMetrics.attach(spark)
    try {
      // two labelled queries with DISTINGUISHABLE output-row counts
      // racing on separate threads — the executionId join must put
      // each execution under its own label (a session-wide tag
      // mislabels whichever finishes second)
      import java.util.concurrent.CyclicBarrier
      val barrier = new CyclicBarrier(2)
      def run(label: String, rows: Int): Thread = {
        val t = new Thread(() => {
          barrier.await()
          for (_ <- 1 to 3) m.recordQuery(label) {
            spark.range(1000).selectExpr("id % " + rows + " AS k")
              .groupBy("k").count()
              .write.format("noop").mode("overwrite").save()
          }
        })
        t.start(); t
      }
      val ta = run("conc_a", 7)
      val tb = run("conc_b", 13)
      ta.join(120000); tb.join(120000)
      m.sync()
      val t = m.table().collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
        .toMap
      assert(t(("query", "conc_a", "executions_total")) == 3.0)
      assert(t(("query", "conc_b", "executions_total")) == 3.0)
      // output rows pin the attribution: 7 groups/run vs 13 groups/run
      assert(t(("query", "conc_a", "output_rows_total")) == 21.0)
      assert(t(("query", "conc_b", "output_rows_total")) == 39.0)
    } finally m.detach()
  }

  test("poller health: one row set per registered connector, " +
      "Prometheus lines, dead flag with error label") {
    import graft.sources._
    val m = graft.metrics.GraftMetrics.attach(spark)
    val broker = new MiniKafkaBroker(numPartitions = 1)
    val mqtt = new MiniMqttBroker()
    try {
      val pre = new KafkaClient("127.0.0.1", broker.port)
      pre.partitions("ph-in")
      pre.produce("ph-in", 0, (1 to 5).map(i => (None, s"""{"i":$i}""")))
      pre.close()
      val kdir = java.nio.file.Files.createTempDirectory("graft_ph_k").toString
      val kp = KafkaPoller.start(
        () => new KafkaClient("127.0.0.1", broker.port), "ph-in", kdir,
        startAt = "earliest", pollIntervalMs = 20L)
      val mdir = java.nio.file.Files.createTempDirectory("graft_ph_m").toString
      // tight reconnect budget so the broker-gone phase below goes
      // terminal fast (the default 8-retry backoff outlasts the test)
      val ms = MqttSubscriber.start("127.0.0.1", mqtt.port, "ph/t", mdir,
        clientId = "graft-ph", maxReconnects = 1)
      try {
        val deadline = System.nanoTime() + 5e9.toLong
        while (kp.recordCount < 5 && System.nanoTime() < deadline)
          Thread.sleep(20)
        assert(kp.recordCount == 5)
        m.registerPoller("kafka", "ph-in", kp)
        m.registerPoller("mqtt", "ph/t", ms)
        val t = m.table().collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
          .toMap
        assert(t(("poller", "kafka/ph-in", "delivered_total")) == 5.0)
        assert(t(("poller", "kafka/ph-in", "dead")) == 0.0)
        assert(t(("poller", "mqtt/ph/t", "delivered_total")) == 0.0)
        assert(t(("poller", "mqtt/ph/t", "dead")) == 0.0)
        // the view is queryable SQL like any table
        assert(spark.sql("SELECT count(*) FROM graft_metrics " +
          "WHERE kind = 'poller'").collect().head.getLong(0) == 8L)
        val prom = m.gather()
        assert(prom.contains(
          """graft_poller_delivered_total{transport="kafka",target="ph-in"} 5.0"""),
          prom)
        assert(prom.contains(
          """graft_poller_dead{transport="mqtt",target="ph/t"} 0.0"""))
        // kill the MQTT broker: the subscriber exhausts reconnects and
        // the dead gauge flips WITH the terminal error as a label
        mqtt.stop()
        val d2 = System.nanoTime() + 30e9.toLong
        while (!ms.isDead && System.nanoTime() < d2) Thread.sleep(50)
        assert(ms.isDead, "subscriber must go terminal once the broker is gone")
        val t2 = m.table().collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3))
          .toMap
        assert(t2(("poller", "mqtt/ph/t", "dead")) == 1.0)
        // reconnects_total counts SUCCESSFUL reconnects — none happen
        // with the broker gone; the row must still be present
        assert(t2.contains(("poller", "mqtt/ph/t", "reconnects_total")))
        val prom2 = m.gather()
        assert(prom2.matches("(?s).*graft_poller_dead\\{transport=\"mqtt\"," +
          "target=\"ph/t\",error=\"[^\"]+\"\\} 1\\.0.*"), prom2)
        // deregistration removes the rows
        m.deregisterPoller("mqtt", "ph/t")
        assert(m.table().filter("kind = 'poller' AND name LIKE 'mqtt%'")
          .count() == 0L)
      } finally { ms.stop(); kp.stop() }
    } finally { broker.stop(); try mqtt.stop() catch { case _: Exception => () }; m.detach() }
  }

  test("detach stops recording; counters remain readable") {
    val m = graft.metrics.GraftMetrics.attach(spark)
    m.recordQuery("probe") {
      spark.range(10).select(sum(col("id"))).collect()
    }
    m.detach()
    val before = m.table().collect().length
    spark.range(10).select(sum(col("id"))).collect()
    m.sync()
    assert(m.table().collect().length == before)
  }
}
