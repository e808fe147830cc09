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
    // one row per (context length k, position): context = lag_k..lag_1
    val ctxRows = (1 to maxDepth).map { k =>
      val ctx = concat_ws(">", (k to 1 by -1).map(i => col(s"__lag$i")): _*)
      withLags
        .filter((1 to k).map(i => col(s"__lag$i").isNotNull).reduce(_ && _))
        .select(lit(k).as("depth"), ctx.as("context"), col("nxt"))
    }.reduce(_ unionByName _)
    val counts = ctxRows.groupBy("depth", "context", "nxt")
      .agg(count(lit(1)).as("cnt"))
    counts.withColumn("prob",
      col("cnt").cast("double") /
        sum(col("cnt")).over(W.partitionBy(col("depth"), col("context")))
          .cast("double"))
  }

  /** Forecast completion probability of the two-step pattern
    * `current → target` for each live event, using the deepest
    * available PST context (longest-suffix lookup, as in pst/).
    * Returns events annotated with forecast_probability /
    * forecast_state, mirroring the reference's forecast builtins.
    */
  def forecastPattern(
      spark: SparkSession,
      events: DataFrame,
      targetType: String,
      maxDepth: Int = 3,
      typeCol: String = "event_type",
      partitionKeys: Seq[String] = Seq("user_id"),
      orderCol: String = "event_id"): DataFrame = {
    val model = pstScores(events, maxDepth, typeCol, partitionKeys, orderCol)
      .filter(col("nxt") === targetType)
      .select(col("depth"), col("context"), col("prob"))
    val w = W.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    val withCtx = (1 to maxDepth).foldLeft(events) { (d, k) =>
      d.withColumn(s"__lag$k", lag(col(typeCol), k - 1).over(w))
    }
    val scored = (maxDepth to 1 by -1).foldLeft(withCtx) { (d, k) =>
      val ctx = concat_ws(">", (k to 1 by -1).map(i => col(s"__lag$i")): _*)
      d.withColumn(s"__ctx$k", ctx)
    }
    // broadcast the (small) model and take the deepest matching context
    val joined = (maxDepth to 1 by -1).foldLeft(scored) { (d, k) =>
      val m = model.filter(col("depth") === k)
        .select(col("context").as(s"__mctx$k"), col("prob").as(s"__p$k"))
      d.join(broadcast(m), col(s"__ctx$k") === col(s"__mctx$k"), "left")
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
