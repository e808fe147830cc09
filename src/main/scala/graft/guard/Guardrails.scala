package graft.guard

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operational guardrails as data-plane operators (reference:
  * varpulis-runtime/src/{dead_letter.rs, tenant.rs,
  * circuit_breaker.rs}).
  *
  * The reference implements these as engine-level runtime services —
  * a mutex-guarded DLQ file, per-tenant token accounting, a breaker
  * per sink. On Spark the equivalent protections live in the data
  * plane, where they stay declarative, distributed and replayable:
  * a validation fork (quarantine instead of poison-pill failure), a
  * per-key admission decision (quota enforcement that is
  * deterministic under replay), and an event-time breaker replay
  * (connector-health decisions that an unbounded streaming run makes
  * live and a batch audit reproduces exactly).
  *
  * All three are shuffle-minimal: the DLQ fork is a zero-exchange map
  * stage; rate limiting shuffles once on the quota key (the same
  * exchange any per-key window needs); breaker replay groups by
  * connector — a bounded-cardinality key by nature (one timeline per
  * sink, processed sequentially because breaker state is inherently
  * serial per connector).
  */
object Guardrails {

  /** Dead-letter fork: validate rows against ordered (ruleName,
    * validPredicate) rules; returns (clean, dlq) where dlq rows carry
    * the FIRST failed rule's name as `error` — the reference DLQ's
    * error metadata (dead_letter.rs DlqEntry). Both sides are lazy
    * projections of one scan: no shuffle, no UDF, and the pipeline
    * continues on `clean` instead of dying on its worst row.
    */
  def deadLetterSplit(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "deadLetterSplit: need at least one rule")
    val err = rules.foldRight(lit(null).cast("string")) {
      case ((name, valid), rest) => when(!valid, lit(name)).otherwise(rest)
    }
    val tagged = df.withColumn("error", err)
    (tagged.filter(col("error").isNull).drop("error"),
      tagged.filter(col("error").isNotNull))
  }

  /** Per-key admission under an events-per-window quota (tenant.rs
    * TenantUsage.record_event: admit while the current window's count
    * is below the cap, reject the rest). Event-time windows make the
    * decision deterministic under replay: within each (key, window)
    * the first `maxPerWindow` events by `orderCol` are admitted.
    * One shuffle on the quota key; the per-window rank is a bounded
    * sort inside each key partition.
    */
  def rateLimit(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      maxPerWindow: Int,
      windowDur: String = "1 hour"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col("win_start"))
      .orderBy(col(orderCol))
    df.withColumn("win_start",
        window(col(tsCol), windowDur).getField("start").cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("admitted", col("rn") <= maxPerWindow)
      .drop("rn")
  }

  /** Circuit-breaker replay per connector: see
    * [[graft.functions.BreakerReplay]] for the state machine. Input
    * is any delivery-outcome log (connector, orderId, ts, ok);
    * output one row per event with its decision
    * (`sent`/`rejected`/`probe`) and the breaker state after it
    * (`closed`/`open`).
    *
    * Scale note: breaker state is inherently SERIAL per connector, so
    * each connector's timeline folds in one task (connectors are a
    * bounded-cardinality key — one per sink). For timelines too large
    * to collect per group, the incremental form is the streaming twin
    * (StreamingQueries.streamBreaker): same step function, bounded
    * watermark-delay buffer, state carried in the store instead of an
    * in-memory array.
    */
  def circuitBreakerReplay(
      df: DataFrame,
      connectorCol: String,
      idCol: String,
      tsCol: String,
      okCol: Column,
      threshold: Int,
      timeout: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val timeoutUs =
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String
          .fromString(timeout))
    require(timeoutUs.months == 0 && timeoutUs.days == 0,
      "circuitBreakerReplay: timeout must be a sub-day duration")
    val evs = sort_array(collect_list(struct(
      col(idCol).as("event_id"),
      unix_micros(col(tsCol)).as("ts_us"),
      okCol.as("ok"))))
    val replayed = df
      .groupBy(col(connectorCol).as("connector"))
      .agg(ColumnBridge.column(graft.functions.BreakerReplay(
        ColumnBridge.expression(evs), threshold,
        timeoutUs.microseconds)).as("replay"))
      .select(col("connector"), explode(col("replay")).as("r"))
    replayed.select(
      col("connector"),
      col("r.event_id").as("event_id"),
      element_at(
        typedlit(Seq("sent", "rejected", "probe")), col("r.dec") + 1)
        .as("decision"),
      element_at(
        typedlit(Seq("closed", "open")), col("r.state") + 1)
        .as("state_after"))
  }
}
