package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trend aggregation — the reference's `.trend_aggregate()` operator
  * (docs/reference/trend-aggregation.md; GRETA propagation in
  * crates/varpulis-runtime/src/greta.rs, multi-query sharing in
  * hamlet/).
  *
  * For a Kleene pattern `E+` inside a window holding n matching
  * events, the set of matching trends is every non-empty ordered
  * subset, so:
  *
  *   - count_trends          = 2^n − 1
  *   - count_events          = n
  *   - sum_trends(x)         = 2^(n−1) · Σx   (each event appears in
  *                             exactly half of all subsets)
  *
  * GRETA's insight is that these aggregates are computable by
  * propagating counts instead of enumerating the O(2^n) trends; on
  * Spark the same collapses further into a closed form over a plain
  * windowed aggregate — a single shuffle on (key, window) with
  * map-side partial aggregation, which is exactly the plan that holds
  * at 100 TB. n is capped far below 2^53 per window in practice, so
  * the pow-based closed form is exact in double arithmetic.
  */
object TrendAggregate {

  /** Multi-query sharing (Hamlet, hamlet/): trend aggregates for
    * several Kleene patterns over the same stream computed in ONE
    * pass — conditional aggregation inside a single (key, window)
    * groupBy, so N patterns share one scan and one shuffle exactly
    * the way Hamlet shares graphlets across queries.
    */
  def kleeneShared(
      events: DataFrame,
      patterns: Seq[(String, Column)],
      windowSize: String,
      partitionKeys: Seq[String],
      tsCol: String = "ts"): DataFrame = {
    val any = patterns.map(_._2).reduce(_ || _)
    val g = partitionKeys.map(col) :+ window(col(tsCol), windowSize).as("w")
    val aggs = patterns.flatMap { case (name, pred) =>
      val n = count(when(pred, 1)).as(s"n_$name")
      val trends = round(pow(lit(2.0), count(when(pred, 1))) - 1.0, 0)
        .cast("long").as(s"trends_$name")
      Seq(n, trends)
    }
    events.filter(any)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("w.start").cast("long"))
      .drop("w")
  }

  /** count_trends / count_events / sum_trends for `pred+` per
    * (partitionKeys × tumbling window).
    */
  def kleene(
      events: DataFrame,
      pred: Column,
      valueCol: Column,
      windowSize: String,
      partitionKeys: Seq[String],
      tsCol: String = "ts"): DataFrame = {
    val g = partitionKeys.map(col) :+ window(col(tsCol), windowSize).as("w")
    events.filter(pred)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,2)")).as("sum_dec"))
      .select(
        (partitionKeys.map(col) :+
          col("w.start").cast("long").as("win_start") :+
          col("n").as("event_count") :+
          round(pow(lit(2.0), col("n")) - 1.0, 0).cast("long").as("count_trends") :+
          (pow(lit(2.0), col("n") - 1) * col("sum_dec").cast("double"))
            .as("sum_trends")): _*)
  }
}
