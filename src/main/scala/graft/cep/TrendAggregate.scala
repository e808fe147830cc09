package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

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
  * at 100 TB.
  *
  * Overflow contract: `count_trends` = 2^n − 1 is emitted as BIGINT
  * only while it is exact and representable — n ≤ [[MaxExactN]] (53, the double mantissa width).
  * Beyond that the column is NULL (a busy key × wide window at 100 TB
  * scale can exceed any integer width; saturating silently would
  * diverge between engines). `count_events` always carries the true
  * n, so a NULL is recoverable downstream. The oracle SQL applies the
  * same CASE guard.
  */
object TrendAggregate {

  /** Largest n for which 2^n − 1 is exact in double AND fits BIGINT. */
  val MaxExactN = 53

  /** 2^n − 1 as BIGINT while exact, NULL beyond [[MaxExactN]].
    * (Also applied by the streaming twin to live windowed counts.)
    */
  def countTrends(n: Column): Column =
    when(n <= MaxExactN,
      round(pow(lit(2.0), n) - 1.0, 0).cast("long"))

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
      val trends = countTrends(count(when(pred, 1))).as(s"trends_$name")
      Seq(n, trends)
    }
    events.filter(any)
      .groupBy(g: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("win_start", col("w.start").cast("long"))
      .drop("w")
  }

  /** Predicate-constrained GRETA (greta.rs:20-29 adjacency;
    * Poppe et al., VLDB'17): trend counting for `E+` where each
    * consecutive pair in a trend must satisfy an inter-event
    * predicate — here strictly-increasing `valueCol`, the paper's
    * canonical example. The 2^n−1 closed form of [[kleene]] only
    * holds when every ordered pair is adjacent; with a predicate the
    * count needs the propagation DP
    *
    *   count(e) = 1 + Σ count(e')  over predecessors e' with v(e') < v(e)
    *
    * and the paper's SUM propagation rides the same pass:
    *
    *   sum(e) = v(e)·count(e) + Σ sum(e')   (decimal-exact, so the
    *   fold order cannot perturb float bits vs the oracle)
    *
    * realized as one shuffle on (key, window) with the DP running
    * inside each group as the native [[graft.functions.GretaDp]]
    * expression — a Fenwick tree over coordinate-compressed value
    * ranks, O(n log n) on primitive arrays through codegen. (The
    * previous formulation was an interpreted `aggregate(...)` HOF
    * fold, O(n²) per group through Catalyst's interpreted-lambda
    * path — the SURVEY §8 sharp edge and BENCH r5's slowest oracled
    * batch query; a dense key×window group made it the straggler
    * task at scale.)
    */
  def kleeneIncreasing(
      events: DataFrame,
      pred: Column,
      valueCol: String,
      windowSize: String,
      partitionKeys: Seq[String],
      tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    val g = partitionKeys.map(col) :+ window(col(tsCol), windowSize).as("w")
    events.filter(pred)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("event_count"),
        sort_array(collect_list(
          struct(col(orderCol).as("o"),
            col(valueCol).cast("double").as("v")))).as("evs"))
      .select(
        (partitionKeys.map(col) :+
          col("w.start").cast("long").as("win_start") :+
          col("event_count") :+
          ColumnBridge.column(graft.functions.GretaDp(
            ColumnBridge.expression(col("evs")))).as("__dp")): _*)
      .withColumn("count_trends", col("__dp.c"))
      .withColumn("sum_trends", col("__dp.s"))
      .drop("__dp")
  }

  /** count_trends / count_events / sum_trends / avg_trends /
    * min_trends / max_trends for `pred+` per (partitionKeys ×
    * tumbling window) — the full trend-aggregation.md function
    * vocabulary. Closed forms over one windowed aggregate:
    * avg_trends = sum_trends / count_trends (the documented
    * definition; NULL past the count_trends overflow guard), and
    * min/max_trends = windowed min/max of the field (every event is
    * itself a singleton trend, so the extremum over all trends is
    * the extremum over events).
    */
  def kleene(
      events: DataFrame,
      pred: Column,
      valueCol: Column,
      windowSize: String,
      partitionKeys: Seq[String],
      tsCol: String = "ts"): DataFrame = {
    val g = partitionKeys.map(col) :+ window(col(tsCol), windowSize).as("w")
    val sumTrends = pow(lit(2.0), col("n") - 1) * col("sum_dec").cast("double")
    events.filter(pred)
      .groupBy(g: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol.cast("decimal(18,2)")).as("sum_dec"),
        min(valueCol).as("min_v"),
        max(valueCol).as("max_v"))
      .select(
        (partitionKeys.map(col) :+
          col("w.start").cast("long").as("win_start") :+
          col("n").as("event_count") :+
          countTrends(col("n")).as("count_trends") :+
          sumTrends.as("sum_trends") :+
          (sumTrends / countTrends(col("n")).cast("double"))
            .as("avg_trends") :+
          col("min_v").as("min_trends") :+
          col("max_v").as("max_trends")): _*)
  }
}
