package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.{KafkaClient, KafkaConnector, KafkaPoller, KafkaProto,
  KafkaRouter}
import org.apache.spark.sql.types._

/** Multi-broker leader routing over a two-node loopback cluster:
  * partition p is led by node p % 2, a non-leader answers
  * NOT_LEADER_OR_FOLLOWER (typed), and [[KafkaRouter]] routes every
  * partition operation to its leader from the Metadata broker list —
  * including a transparent metadata refresh + re-route when
  * leadership MOVES mid-stream. The sink and poller ride the router,
  * so a single-bootstrap config works against clusters where the
  * bootstrap broker does not lead every partition (the normal Kafka
  * topology).
  */
class KafkaClusterSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("value", DoubleType)))

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(20); ok = cond }
    ok
  }

  test("a non-leader answers NOT_LEADER_OR_FOLLOWER, typed, on all three ops") {
    val (_, brokers) = MiniKafkaBroker.cluster(numPartitions = 4, nodes = 2)
    try {
      val direct = new KafkaClient("127.0.0.1", brokers(0).port)
      try {
        assert(direct.partitions("t").sorted == Seq(0, 1, 2, 3))
        // node 0 leads even partitions; odd ones reject data requests
        direct.produce("t", 0, Seq((None, """{"id":0}""")))
        intercept[KafkaProto.NotLeader](
          direct.produce("t", 1, Seq((None, """{"id":1}"""))))
        intercept[KafkaProto.NotLeader](direct.listOffset("t", 1, -1L))
        intercept[KafkaProto.NotLeader](direct.fetch("t", 1, 0L))
        // the leader accepts the same requests
        assert(direct.listOffset("t", 0, -1L) == 1L)
        assert(direct.fetch("t", 0, 0L)._1.size == 1)
      } finally direct.close()
    } finally brokers.foreach(_.stop())
  }

  test("router routes each partition op to its leader from one bootstrap") {
    val (_, brokers) = MiniKafkaBroker.cluster(numPartitions = 4, nodes = 2)
    try {
      // bootstrap is node 0 ONLY — odd partitions live on node 1
      val r = new KafkaRouter("127.0.0.1", brokers(0).port)
      try {
        assert(r.partitions("t").sorted == Seq(0, 1, 2, 3))
        (0 until 4).foreach { p =>
          val base = r.produce("t", p, Seq((None, s"""{"id":$p}""")),
            System.currentTimeMillis())
          assert(base == 0L)
        }
        // every partition readable through the router too
        (0 until 4).foreach { p =>
          assert(r.listOffset("t", p, -1L) == 1L)
          val (recs, _) = r.fetch("t", p, 0L)
          assert(recs.map(x => new String(x.value, UTF_8)) ==
            Seq(s"""{"id":$p}"""))
        }
        // the data requests really split across the two nodes
        assert(brokers(0).producesSeen == 2 && brokers(1).producesSeen == 2,
          s"produces split ${brokers(0).producesSeen}/${brokers(1).producesSeen}")
      } finally r.close()
    } finally brokers.foreach(_.stop())
  }

  test("leadership change mid-stream: router refreshes and re-routes") {
    val (cl, brokers) = MiniKafkaBroker.cluster(numPartitions = 2, nodes = 2)
    try {
      val r = new KafkaRouter("127.0.0.1", brokers(0).port)
      try {
        r.partitions("t")
        r.produce("t", 1, Seq((None, """{"id":1}""")),
          System.currentTimeMillis()) // leader: node 1
        // reassign: node 0 now leads EVERYTHING (broker restart /
        // reassignment); the router's view is stale until the old
        // leader answers NOT_LEADER
        cl.leaderOf = _ => 0
        val base = r.produce("t", 1, Seq((None, """{"id":2}""")),
          System.currentTimeMillis())
        assert(base == 1L, "refresh + re-route must succeed transparently")
        assert(r.fetch("t", 1, 0L)._1.size == 2)
      } finally r.close()
    } finally brokers.foreach(_.stop())
  }

  test("poller on a router consumes every partition of the cluster") {
    val (_, brokers) = MiniKafkaBroker.cluster(numPartitions = 4, nodes = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_kcluster_src_")
    try {
      val pre = new KafkaRouter("127.0.0.1", brokers(0).port)
      (0 until 4).foreach { p =>
        pre.produce("ev", p,
          Seq((None, s"""{"id":$p,"kind":"k$p","value":$p.5}""")),
          System.currentTimeMillis())
      }
      pre.close()
      val poller = KafkaPoller.start(
        () => new KafkaRouter("127.0.0.1", brokers(0).port), "ev",
        dir.toString, startAt = "earliest", pollIntervalMs = 20L)
      try {
        assert(awaitTrue(5000)(poller.recordCount == 4),
          s"records=${poller.recordCount}")
        assert(!poller.isDead)
      } finally poller.stop()
      val got = spark.read.schema(schema).json(dir.toString)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == (0 until 4).map(p => (p.toLong, s"k$p", p + 0.5)).toSet)
    } finally brokers.foreach(_.stop())
  }

  test("sink against one bootstrap produces across all leaders") {
    val (_, brokers) = MiniKafkaBroker.cluster(numPartitions = 4, nodes = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_kcluster_sink_")
    try {
      val conn = KafkaConnector("cl", "127.0.0.1", brokers(0).port, "out",
        dir.toString, batchSize = 1) // 1-row chunks rotate all partitions
      import spark.implicits._
      val in = (1 to 8).map(i => (i.toLong, s"k$i", i * 0.5))
        .toDF("id", "kind", "value").repartition(2)
      conn.write(in)
      val total = (0 until 4).map(p => brokers(0).logSize("out", p)).sum
      assert(total == 8, s"cluster holds $total records")
      // chunk rotation spread rows over partitions on BOTH nodes
      assert((0 until 4).forall(p => brokers(0).logSize("out", p) > 0),
        "every partition must receive rows")
      assert(brokers(0).producesSeen > 0 && brokers(1).producesSeen > 0,
        "both brokers must see produces")
    } finally brokers.foreach(_.stop())
  }
}
