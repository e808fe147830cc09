package graft.cep

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Pattern forecasting — the reference's `.forecast()` operator
  * (crates/varpulis-runtime/src/pst/, docs/language/builtins.md
  * "Forecast Built-in Variables").
  *
  * The reference trains a Probabilistic Suffix Tree (variable-order
  * Markov model) over event-type sequences and predicts pattern
  * completion probability. Batch realization:
  *
  *  - [[transitions]] — the order-1 model: P(next | current) from the
  *    observed per-key event sequence. Fully declarative (lead() +
  *    windowed normalization), one shuffle on the partition key.
  *  - [[pstScores]] — variable-order contexts up to `maxDepth`:
  *    P(next | last-k context) for every context length ≤ maxDepth,
  *    built by exploding per-row context n-grams (no driver-side
  *    state; scales linearly with events × depth).
  *
  * Forecast probability for a pattern step then = the PST score of
  * the longest matching context, mirroring pst/ lookup semantics.
  */
object Forecast {

  /** Order-1 transition probabilities per event type. */
  def transitions(
      events: DataFrame,
      typeCol: String = "event_type",
      partitionKeys: Seq[String] = Seq("user_id"),
      orderCol: String = "event_id"): DataFrame = {
    val w = W.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    val pairs = events
      .select((partitionKeys.map(col) :+ col(orderCol) :+ col(typeCol).as("cur")): _*)
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
    val counts = pairs.groupBy("cur", "nxt").agg(count(lit(1)).as("cnt"))
    counts.withColumn("prob",
      col("cnt").cast("double") /
        sum(col("cnt")).over(W.partitionBy(col("cur"))).cast("double"))
  }

  /** Variable-order (PST) conditional probabilities: for every context
    * of length 1..maxDepth, P(next event type | context). Context is
    * the concatenation of the preceding k event types.
    */
  def pstScores(
      events: DataFrame,
      maxDepth: Int = 3,
      typeCol: String = "event_type",
      partitionKeys: Seq[String] = Seq("user_id"),
      orderCol: String = "event_id"): DataFrame = {
    val w = W.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    val withLags = (1 to maxDepth).foldLeft(
      events.select((partitionKeys.map(col) :+ col(orderCol) :+
        col(typeCol).as("nxt")): _*)) { (d, k) =>
      d.withColumn(s"__lag$k", lag(col("nxt"), k).over(w))
    }
    // one row per (context length k, position), generated in a SINGLE
    // pass: each row fans out its ≤maxDepth (depth, context) structs
    // through one explode (the earlier per-depth union re-ran the
    // window/sort pipeline once per depth)
    val ctxStructs = (1 to maxDepth).map { k =>
      val ctx = concat_ws(">", (k to 1 by -1).map(i => col(s"__lag$i")): _*)
      when((1 to k).map(i => col(s"__lag$i").isNotNull).reduce(_ && _),
        struct(lit(k).as("depth"), ctx.as("context")))
    }
    val ctxRows = withLags
      .select(explode(array_compact(array(ctxStructs: _*))).as("dc"),
        col("nxt"))
      .select(col("dc.depth").as("depth"), col("dc.context").as("context"),
        col("nxt"))
    val counts = ctxRows.groupBy("depth", "context", "nxt")
      .agg(count(lit(1)).as("cnt"))
    counts.withColumn("prob",
      col("cnt").cast("double") /
        sum(col("cnt")).over(W.partitionBy(col("depth"), col("context")))
          .cast("double"))
  }

  /** Hawkes self-exciting intensity per event (pst/hawkes.rs:7-9):
    *
    *   intensity(t) = mu + (intensity(prev) - mu + alpha) * exp(-beta*dt)
    *
    * with the first event of a key initialized to mu + alpha
    * (hawkes.rs update()). Realized as an in-order fold over each
    * key's event array — the O(1)-per-event recursion the reference
    * runs, executed inside the group by the native codegen'd
    * [[graft.functions.HawkesFold]] after one shuffle on the
    * partition key (the earlier interpreted `aggregate` HOF with an
    * `array_append` accumulator was quadratic per key and ran on the
    * interpreted-lambda path). Parameters are fixed here; the
    * adaptive variant below re-estimates them online.
    *
    * Memory bound: `collect_list` holds ONE key's full history in a
    * single row — fine for bounded keys (users/devices), not for an
    * unbounded single-key timeline at 100 TB; the streaming twin
    * (StreamingQueries.streamHawkes) carries the recursion's O(1)
    * per-key state incrementally and is the path for unbounded
    * histories.
    *
    * `boost_factor` = clamp(intensity/mu, 1, 5) (hawkes.rs
    * boost_factor), the multiplier the reference applies to pattern
    * completion probabilities during bursts.
    *
    * @param mu    baseline rate, events/second
    * @param alpha excitation added per event, events/second
    * @param beta  decay rate, 1/second
    */
  def hawkesIntensity(
      events: DataFrame,
      mu: Double,
      alpha: Double,
      beta: Double,
      partitionKeys: Seq[String] = Seq("user_id"),
      tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val g = partitionKeys.map(col)
    val folded = events
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("o"), unix_micros(col(tsCol)).as("t")))).as("evs"))
      .withColumn("res", ColumnBridge.column(graft.functions.HawkesFold(
        ColumnBridge.expression(col("evs")), mu, alpha, beta)))
      .select((g :+ explode(col("res")).as("e")): _*)
    folded.select(
      (partitionKeys.map(col) :+
        col("e.o").as(orderCol) :+
        col("e.i").as("intensity") :+
        least(greatest(col("e.i") / lit(mu), lit(1.0)), lit(5.0))
          .as("boost_factor")): _*)
  }

  /** Fully-adaptive Hawkes intensity (pst/hawkes.rs including online
    * parameter estimation): per event, after the O(1) intensity
    * recursion, mu/beta are re-estimated by EMA moment matching once
    * MIN_EVENTS_FOR_ESTIMATION (10) events are seen —
    *
    *   ema_d  = 0.05·dt + 0.95·ema_d          (init: first dt)
    *   mu     = max(1/ema_d, 1e-15)
    *   beta   = max(1/sqrt(ema_d2 − ema_d²), 1e-15)  (if var > 0)
    *   alpha  = 0.5·mu;  intensity = max(intensity, mu)
    *
    * — the same regime-change adaptation (~20-40 events) the
    * reference gets from EMA_ALPHA = 0.05. The whole per-key
    * recursion runs as one native codegen'd O(n) fold
    * ([[graft.functions.HawkesFoldAdaptive]]) after a single shuffle
    * on the partition key; all time math in seconds. Same per-key
    * collect_list memory bound / streaming-twin escape hatch as
    * [[hawkesIntensity]].
    */
  def hawkesIntensityAdaptive(
      events: DataFrame,
      mu0: Double = 1.0,
      alpha0: Double = 0.5,
      beta0: Double = 1.0,
      partitionKeys: Seq[String] = Seq("user_id"),
      tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val g = partitionKeys.map(col)
    val folded = events
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(
        col(orderCol).as("o"), unix_micros(col(tsCol)).as("t")))).as("evs"))
      .withColumn("res", ColumnBridge.column(
        graft.functions.HawkesFoldAdaptive(
          ColumnBridge.expression(col("evs")), mu0, alpha0, beta0)))
      .select((g :+ explode(col("res")).as("e")): _*)
    folded.select(
      (partitionKeys.map(col) :+
        col("e.o").as(orderCol) :+
        col("e.i").as("intensity") :+
        col("e.b").as("boost_factor")): _*)
  }

  /** Conformal prediction intervals on forecast probabilities
    * (pst/conformal.rs): nonconformity = |p − outcome| over a
    * trailing calibration window; the interval is
    * [p − q, p + q] clamped to [0,1] where q = the coverage-quantile
    * of trailing scores, and (0,1) when no calibration data exists.
    *
    * Forecast model: order-1 transitions P(next = target | current)
    * — the same declarative model as [[transitions]], so the entire
    * pipeline (model + outcomes + windowed quantile) stays
    * oracle-expressible. The calibrator is per partition key (the
    * reference keeps one global sliding window, conformal.rs:30 —
    * per-key calibration is the shape that shards at 100 TB, and
    * exchangeability holds within a key as well as globally).
    * Probabilities and quantiles are rounded to 6 places on both
    * engine and oracle sides for bit-stable parity.
    */
  def conformalIntervals(
      events: DataFrame,
      targetType: String,
      coverage: Double = 0.9,
      calWindow: Int = 50,
      partitionKeys: Seq[String] = Seq("user_id"),
      typeCol: String = "event_type",
      orderCol: String = "event_id"): DataFrame = {
    val w = W.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    val pairs = events
      .select((partitionKeys.map(col) :+ col(orderCol) :+
        col(typeCol).as("cur")): _*)
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
    // order-1 model: P(next = target | cur); 0/1 doubles sum exactly
    val model = pairs.groupBy("cur").agg(
      (sum(when(col("nxt") === targetType, 1.0).otherwise(0.0)) /
        count(lit(1)).cast("double")).as("p"))
    val scored = pairs.join(broadcast(model), "cur")
      .withColumn("outcome",
        when(col("nxt") === targetType, 1.0).otherwise(0.0))
      .withColumn("score", abs(col("p") - col("outcome")))
    val cal = w.rowsBetween(-calWindow, -1)
    scored
      .withColumn("q",
        round(expr(s"percentile(score, ${coverage}D)").over(cal), 6))
      .withColumn("p", round(col("p"), 6))
      .select(
        (partitionKeys.map(col) :+ col(orderCol) :+ col("p") :+
          coalesce(greatest(col("p") - col("q"), lit(0.0)), lit(0.0)).as("lo") :+
          coalesce(least(col("p") + col("q"), lit(1.0)), lit(1.0)).as("hi")): _*)
  }

  /** Forecast completion probability of the two-step pattern
    * `current → target` for each live event, using the deepest
    * available PST context (longest-suffix lookup, as in pst/).
    * Returns events annotated with forecast_probability /
    * forecast_state, mirroring the reference's forecast builtins.
    *
    * Execution shape: exactly TWO passes over events — one window
    * pass fits the PST (an in-memory model, like the reference's
    * pst/ tree; cap-guarded driver collect), one window pass scores
    * every event against it via literal-map lookups (small model) or
    * broadcast LocalRelation joins (large model). Probabilities are
    * exact count ratios, bit-identical to the pstScores formulation.
    */
  def forecastPattern(
      spark: SparkSession,
      events: DataFrame,
      targetType: String,
      maxDepth: Int = 3,
      typeCol: String = "event_type",
      partitionKeys: Seq[String] = Seq("user_id"),
      orderCol: String = "event_id",
      maxModelRows: Int = 2000000): DataFrame = {
    val w = W.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    // ONE window pass computes lags 1..maxDepth of the type column;
    // BOTH the model contexts (lags k..1 predicting this row's type)
    // and the live scoring contexts (lags k-1..1 then this row's
    // type) derive from these columns. The earlier shape ran a full
    // window pass for the scoring frame PLUS one per depth inside the
    // joins' model.filter(depth===k) build sides — maxDepth+1 passes
    // over events where two suffice.
    val withLags = (1 to maxDepth).foldLeft(events) { (d, k) =>
      d.withColumn(s"__lag$k", lag(col(typeCol), k).over(w))
    }
    // PST model fit: P(next = target | context of depth k) as an exact
    // count ratio per (depth, context), keeping only contexts with >0
    // target continuations (longest-suffix lookup must fall through
    // to a shallower context otherwise). Like the reference, the PST
    // is an in-memory model (pst/ builds it on the heap): it collects
    // ONCE to the driver under a cap guard and re-enters the plan as
    // per-depth LocalRelations, so the scoring joins broadcast tiny
    // local tables instead of re-running the fit per depth.
    val ctxStructs = (1 to maxDepth).map { k =>
      val ctx = concat_ws(">", (k to 1 by -1).map(i => col(s"__lag$i")): _*)
      when((1 to k).map(i => col(s"__lag$i").isNotNull).reduce(_ && _),
        struct(lit(k).as("depth"), ctx.as("context")))
    }
    val modelDf = withLags
      .select(explode(array_compact(array(ctxStructs: _*))).as("dc"),
        col(typeCol).as("nxt"))
      .groupBy(col("dc.depth").as("depth"), col("dc.context").as("context"))
      .agg(sum(when(col("nxt") === targetType, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("total"))
      .filter(col("hits") > 0)
      // same longs, same division as the pstScores formulation —
      // bit-identical probabilities
      .select(col("context"),
        (col("hits").cast("double") / col("total").cast("double")).as("prob"),
        col("depth"))
    // ONE action fits the model: limit+collect bounds driver memory,
    // and the length check turns an oversized model into a loud
    // failure instead of a silent OOM
    val modelRows = modelDf.limit(maxModelRows + 1).collect()
    require(modelRows.length <= maxModelRows,
      s"forecastPattern: PST model exceeds $maxModelRows contexts — " +
        "reduce maxDepth or the type-column cardinality at this scale")
    val byDepth = modelRows
      .groupBy(_.getAs[Int]("depth"))
      .view.mapValues(_.map(r =>
        (r.getAs[String]("context"), r.getAs[Double]("prob"))).toSeq)
      .toMap
    import spark.implicits._
    // scoring contexts share the same lag columns: depth-k context is
    // lags k-1..1 then the current type
    val scored = (1 to maxDepth).foldLeft(withLags) { (d, k) =>
      val parts = ((k - 1) to 1 by -1).map(i => col(s"__lag$i")) :+ col(typeCol)
      d.withColumn(s"__ctx$k", concat_ws(">", parts: _*))
    }
    // deepest-context-wins lookup, adaptive by model size: a small
    // model (the common case — context cardinality is typeCol's
    // vocabulary ^ depth) becomes literal-map element_at lookups, a
    // pure codegen projection with ZERO joins in the scoring pass;
    // element_at on a literal map is a linear scan, so past the
    // threshold the per-depth slices join as broadcast LocalRelations
    // instead (O(1) hash probes)
    val mapLookupThreshold = 1024
    val joined =
      if (modelRows.length <= mapLookupThreshold) {
        (maxDepth to 1 by -1).foldLeft(scored) { (d, k) =>
          val m = byDepth.getOrElse(k, Seq.empty).toMap
          val p = if (m.isEmpty) lit(null).cast("double")
            else element_at(typedlit(m), col(s"__ctx$k"))
          d.withColumn(s"__p$k", p)
        }
      } else {
        (maxDepth to 1 by -1).foldLeft(scored) { (d, k) =>
          val m = byDepth.getOrElse(k, Seq.empty)
            .toDF(s"__mctx$k", s"__p$k")
          d.join(broadcast(m), col(s"__ctx$k") === col(s"__mctx$k"), "left")
        }
      }
    val prob = coalesce(
      ((maxDepth to 1 by -1).map(k => col(s"__p$k")) :+ lit(0.0)): _*)
    val state = coalesce(
      ((maxDepth to 1 by -1).map(k =>
        when(col(s"__p$k").isNotNull, col(s"__ctx$k"))) :+ col("__ctx1")): _*)
    joined
      .withColumn("forecast_probability", prob)
      .withColumn("forecast_state", state)
      .drop((1 to maxDepth).flatMap(k =>
        Seq(s"__lag$k", s"__ctx$k", s"__mctx$k", s"__p$k")): _*)
  }
}
