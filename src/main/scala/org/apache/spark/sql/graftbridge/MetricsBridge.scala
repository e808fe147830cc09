package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Bridge into `private[spark]`/`private[sql]` surfaces needed by
  * [[graft.metrics.GraftMetrics]]: walking an (adaptive) executed
  * plan for its SQLMetric counters, and draining the async listener
  * bus so counters are readable deterministically after an action.
  * Lives under org.apache.spark.sql purely for access; contains no
  * Spark-internal copies.
  */
object MetricsBridge {

  /** Counters extracted from a finished execution's physical plan:
    * (outputRows, scanRows, scanBytes). outputRows is the first
    * numOutputRows metric in pre-order (the plan's result size for
    * queries; for writes, the write node's row count); scanRows/
    * scanBytes sum numOutputRows/filesSize over leaf scan nodes —
    * AQE wrapper and query-stage nodes are unwrapped so stages that
    * already ran are counted.
    */
  def planCounters(qe: QueryExecution): (Option[Long], Long, Long) = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case s: QueryStageExec        => s +: walk(s.plan)
      case other                    => other +: other.children.flatMap(walk)
    }
    val nodes = scala.util.Try(walk(qe.executedPlan)).getOrElse(Seq.empty)
    def metric(p: SparkPlan, name: String): Option[Long] =
      p.metrics.get(name).map(_.value).filter(_ >= 0)
    val outputRows = nodes.iterator
      .flatMap(metric(_, "numOutputRows")).nextOption()
    val leaves = nodes.filter(_.children.isEmpty)
    val scanRows = leaves.flatMap(metric(_, "numOutputRows")).sum
    val scanBytes = leaves.flatMap(metric(_, "filesSize")).sum
    (outputRows, scanRows, scanBytes)
  }

  /** Block until every queued listener event (including
    * QueryExecutionListener callbacks) has been delivered.
    */
  def drain(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Unpack a SparkListenerSQLExecutionEnd's `private[sql]` fields
    * for the metrics listener: (executionId, actionName when the
    * execution came from a named Dataset action, failed, qe,
    * durationNs). Returns None for any other event type.
    */
  def sqlExecutionEnd(e: org.apache.spark.scheduler.SparkListenerEvent)
      : Option[(Long, Option[String], Boolean, QueryExecution, Long)] =
    e match {
      case end: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
        Some((end.executionId, end.executionName,
          end.executionFailure.isDefined, end.qe, end.duration))
      case _ => None
    }
}
