package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.MetricsBridge
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable

/** Engine observability counters — the data-plane analogue of the
  * reference's per-stream metrics registry
  * (crates/varpulis-runtime/src/metrics.rs:11-121: events_total,
  * events_processed per stream, output_events_total, processing
  * latency, active_streams; served as Prometheus text over its REST
  * API). graft delegates transport to Spark's own metrics system;
  * what Spark does NOT give out of the box is the reference's
  * per-QUERY counter surface, which this class derives from the two
  * public listener hooks:
  *
  *  - batch: a SparkListener reading each finished SQL execution's
  *    plan SQLMetrics (output rows, leaf-scan rows/bytes) plus
  *    duration — executions / events in / events out / bytes /
  *    latency per query label, joined to its recordQuery tag by
  *    execution id;
  *  - streaming: a StreamingQueryListener folding each progress
  *    event — micro-batches, input rows, sink rows, state rows,
  *    watermark-dropped rows, processing time per stream name, and
  *    an active-streams gauge.
  *
  * Counters surface two ways: [[table]] (a `graft_metrics` temp view
  * — queryable like any other table, the Spark-native idiom) and
  * [[gather]] (Prometheus text exposition, the reference's wire
  * format, ready for any scrape endpoint).
  *
  * Label discipline: batch executions are labelled by the enclosing
  * [[recordQuery]] tag when present, else by the triggering action
  * name. The tag travels as a thread-LOCAL property on the submitting
  * thread, rides into each job's properties next to the SQL execution
  * id, and is joined back to the finished execution BY THAT id — so
  * concurrent tagged queries on separate threads attribute correctly
  * (a session-wide tag would mislabel whichever finished second).
  */
final class GraftMetrics private (spark: SparkSession) {

  private final class BatchStat {
    var executions = 0L
    var failures = 0L
    var outputRows = 0L
    var scanRows = 0L
    var scanBytes = 0L
    var totalSec = 0.0
    var maxSec = 0.0
  }
  private final class StreamStat {
    var batches = 0L
    var inputRows = 0L
    var sinkRows = 0L
    var stateRows = 0L // gauge: latest total
    var droppedRows = 0L
    var totalSec = 0.0
  }

  private val lock = new Object
  private val batch = mutable.LinkedHashMap.empty[String, BatchStat]
  private val streams = mutable.LinkedHashMap.empty[String, StreamStat]
  // live poller references: counters are read at snapshot time, so a
  // registered poller needs no push hooks (reference managed_registry
  // keeps per-connector health the same pull-shaped way)
  private val pollers =
    mutable.LinkedHashMap.empty[(String, String), graft.sources.PollerHealth]
  private val activeStreams = mutable.Set.empty[java.util.UUID]
  // executionId -> recordQuery tag, learned from job properties
  private val execTags = mutable.Map.empty[Long, String]

  /** One SparkListener covers the whole batch surface: each job's
    * properties carry BOTH the SQL execution id and (when the job was
    * submitted under [[recordQuery]]) the graft tag — that pair maps
    * executionId -> tag; the SQLExecutionEnd event then carries the
    * finished QueryExecution, its duration, the action name, and the
    * same executionId to join on. Executions without an action name
    * (streaming micro-batches) are skipped here, exactly as the
    * QueryExecutionListener surface skips them — the streaming
    * listener owns those.
    */
  private val queryListener = new SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit = {
      val p = js.properties
      if (p != null) {
        val eid = p.getProperty("spark.sql.execution.id")
        val t = p.getProperty(GraftMetrics.TagProperty)
        if (eid != null && t != null)
          scala.util.Try(eid.toLong).foreach { id =>
            lock.synchronized { execTags.getOrElseUpdate(id, t) }
          }
      }
    }
    override def onOtherEvent(e: SparkListenerEvent): Unit =
      MetricsBridge.sqlExecutionEnd(e).foreach {
        case (executionId, actionName, failed, qe, durationNs) =>
          lock.synchronized {
            val tagged = execTags.remove(executionId)
            actionName.foreach { action =>
              val s = batch.getOrElseUpdate(
                tagged.getOrElse(action), new BatchStat)
              if (failed) s.failures += 1
              else {
                val (out, scanRows, scanBytes) = MetricsBridge.planCounters(qe)
                s.executions += 1
                s.outputRows += out.getOrElse(0L)
                s.scanRows += scanRows
                s.scanBytes += scanBytes
                val sec = durationNs / 1e9
                s.totalSec += sec
                s.maxSec = math.max(s.maxSec, sec)
              }
            }
          }
      }
  }

  private val streamListener = new StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      lock.synchronized { activeStreams += e.id }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      lock.synchronized { activeStreams -= e.id }
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      lock.synchronized {
        val p = e.progress
        val s = streams.getOrElseUpdate(
          Option(p.name).getOrElse("unnamed"), new StreamStat)
        s.batches += 1
        s.inputRows += p.numInputRows
        s.sinkRows += math.max(p.sink.numOutputRows, 0L)
        val ops = p.stateOperators
        if (ops.nonEmpty) s.stateRows = ops.map(_.numRowsTotal).sum
        s.droppedRows += ops.map(_.numRowsDroppedByWatermark).sum
        Option(p.durationMs.get("triggerExecution"))
          .foreach(ms => s.totalSec += ms / 1e3)
      }
  }

  /** Run `body` with batch executions labelled `name` instead of the
    * action name. The label is a thread-local job property joined to
    * executions by id, so concurrent recordQuery blocks on different
    * threads attribute independently; the trailing drain makes the
    * counters readable immediately after the block returns.
    */
  def recordQuery[T](name: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty(GraftMetrics.TagProperty)
    sc.setLocalProperty(GraftMetrics.TagProperty, name)
    try body
    finally {
      sc.setLocalProperty(GraftMetrics.TagProperty, prev) // null clears
      MetricsBridge.drain(spark)
    }
  }

  /** Block until all pending listener events are folded in. */
  def sync(): Unit = MetricsBridge.drain(spark)

  /** Register a live ingestion loop under (transport, target) — its
    * delivered/failure/reconnect counters and dead flag appear as
    * `poller` rows in [[table]] and `graft_poller_*` lines in
    * [[gather]] until [[deregisterPoller]]. Registration stores the
    * reference; counters are read fresh at every snapshot.
    */
  def registerPoller(transport: String, target: String,
      p: graft.sources.PollerHealth): Unit =
    lock.synchronized { pollers((transport, target)) = p }

  def deregisterPoller(transport: String, target: String): Unit =
    lock.synchronized { pollers.remove((transport, target)); () }

  /** Counter snapshot in long format: (kind, name, metric, value) —
    * registered as the `graft_metrics` temp view.
    */
  def table(): DataFrame = {
    sync()
    val rows = lock.synchronized {
      val b = batch.toSeq.flatMap { case (n, s) =>
        Seq(
          ("query", n, "executions_total", s.executions.toDouble),
          ("query", n, "failures_total", s.failures.toDouble),
          ("query", n, "output_rows_total", s.outputRows.toDouble),
          ("query", n, "scan_rows_total", s.scanRows.toDouble),
          ("query", n, "scan_bytes_total", s.scanBytes.toDouble),
          ("query", n, "duration_seconds_total", s.totalSec),
          ("query", n, "duration_seconds_max", s.maxSec))
      }
      val st = streams.toSeq.flatMap { case (n, s) =>
        Seq(
          ("stream", n, "batches_total", s.batches.toDouble),
          ("stream", n, "input_rows_total", s.inputRows.toDouble),
          ("stream", n, "sink_rows_total", s.sinkRows.toDouble),
          ("stream", n, "state_rows", s.stateRows.toDouble),
          ("stream", n, "rows_dropped_by_watermark_total",
            s.droppedRows.toDouble),
          ("stream", n, "processing_seconds_total", s.totalSec))
      }
      val ph = pollers.toSeq.flatMap { case ((transport, target), p) =>
        val n = s"$transport/$target"
        Seq(
          ("poller", n, "delivered_total", p.deliveredCount.toDouble),
          ("poller", n, "failures_total", p.healthFailures.toDouble),
          ("poller", n, "reconnects_total", p.healthReconnects.toDouble),
          ("poller", n, "dead", if (p.isDead) 1.0 else 0.0))
      }
      b ++ st ++ ph :+ (("engine", "", "active_streams",
        activeStreams.size.toDouble))
    }
    import spark.implicits._
    val df = rows.toDF("kind", "name", "metric", "value")
    df.createOrReplaceTempView("graft_metrics")
    df
  }

  /** Prometheus text exposition of the same counters — the
    * reference's wire format (metrics.rs `gather()`), prefixed
    * `graft_`.
    */
  def gather(): String = {
    sync()
    lock.synchronized {
      val sb = new StringBuilder
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      def line(metric: String, labels: Seq[(String, String)], v: Double): Unit = {
        val l =
          if (labels.isEmpty) ""
          else labels.map { case (k, x) => s"""$k="${esc(x)}"""" }
            .mkString("{", ",", "}")
        sb.append(s"graft_$metric$l $v\n")
      }
      batch.foreach { case (n, s) =>
        val q = Seq("query" -> n)
        line("queries_total", q, s.executions.toDouble)
        line("query_failures_total", q, s.failures.toDouble)
        line("output_rows_total", q, s.outputRows.toDouble)
        line("scan_rows_total", q, s.scanRows.toDouble)
        line("scan_bytes_total", q, s.scanBytes.toDouble)
        line("query_duration_seconds_total", q, s.totalSec)
      }
      streams.foreach { case (n, s) =>
        val q = Seq("stream" -> n)
        line("stream_batches_total", q, s.batches.toDouble)
        line("stream_input_rows_total", q, s.inputRows.toDouble)
        line("stream_sink_rows_total", q, s.sinkRows.toDouble)
        line("stream_state_rows", q, s.stateRows.toDouble)
        line("stream_rows_dropped_by_watermark_total", q,
          s.droppedRows.toDouble)
        line("stream_processing_seconds_total", q, s.totalSec)
      }
      pollers.foreach { case ((transport, target), p) =>
        val l = Seq("transport" -> transport, "target" -> target)
        line("poller_delivered_total", l, p.deliveredCount.toDouble)
        line("poller_failures_total", l, p.healthFailures.toDouble)
        line("poller_reconnects_total", l, p.healthReconnects.toDouble)
        // the terminal error travels as a label on the dead gauge —
        // numeric columns can't carry it, the exposition can
        line("poller_dead",
          l ++ p.terminalError.map(e =>
            "error" -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"),
          if (p.isDead) 1.0 else 0.0)
      }
      line("active_streams", Seq.empty, activeStreams.size.toDouble)
      sb.toString
    }
  }

  /** Unregister both listeners; counters stay readable. */
  def detach(): Unit = {
    spark.sparkContext.removeSparkListener(queryListener)
    spark.streams.removeListener(streamListener)
  }
}

object GraftMetrics {
  /** Job-local property carrying the recordQuery label from the
    * submitting thread into each job's properties.
    */
  val TagProperty = "graft.metrics.tag"

  /** Attach a fresh counter registry to the session (both listener
    * hooks). Call [[GraftMetrics.detach]] to stop recording.
    */
  def attach(spark: SparkSession): GraftMetrics = {
    val m = new GraftMetrics(spark)
    spark.sparkContext.addSparkListener(m.queryListener)
    spark.streams.addListener(m.streamListener)
    m
  }
}
