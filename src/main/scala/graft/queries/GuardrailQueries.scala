package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.guard.Guardrails

/** Operational-guardrail queries (SURVEY §2 #50–52; reference
  * varpulis-runtime/src/{dead_letter.rs, tenant.rs,
  * circuit_breaker.rs}) — the engine-level runtime services
  * re-expressed as oracle-checkable data-plane operators, see
  * [[graft.guard.Guardrails]].
  */
object GuardrailQueries {

  /** Validation rules for the events table: a value outside its
    * plausible domain, then a props payload key outside the vocab.
    * First failed rule names the quarantine reason, like the
    * reference DLQ's error field.
    */
  private val eventRules = Seq(
    "value_out_of_range" ->
      (col("value") >= 0.05 && col("value") <= 400.0),
    "props_key_out_of_range" ->
      (regexp_extract(col("props"), "[0-9]+", 0).cast("int") <= 90))

  val defs: Map[String, QueryDef] = Map(
    // --- dead-letter quarantine (dead_letter.rs) --------------------
    "g1_dead_letter" -> QueryDef.of(
      """SELECT event_id, user_id, event_type, error FROM (
        |  SELECT event_id, user_id, event_type,
        |    CASE
        |      WHEN NOT (value >= 0.05 AND value <= 400.0)
        |        THEN 'value_out_of_range'
        |      WHEN CAST(regexp_extract(props, '[0-9]+') AS INT) > 90
        |        THEN 'props_key_out_of_range'
        |    END AS error
        |  FROM events)
        |WHERE error IS NOT NULL""".stripMargin) { (s, dir) =>
      val (_, dlq) = Guardrails.deadLetterSplit(
        Tables(s, dir).events, eventRules)
      dlq.select(col("event_id"), col("user_id"), col("event_type"),
        col("error"))
    },

    // --- per-tenant rate-limit quota (tenant.rs record_event) -------
    "g2_rate_limit" -> QueryDef.of(
      """SELECT event_id, user_id,
        | (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | (row_number() OVER (
        |    PARTITION BY user_id, epoch_us(ts) // 3600000000
        |    ORDER BY event_id) <= 2) AS admitted
        |FROM events""".stripMargin) { (s, dir) =>
      Guardrails.rateLimit(Tables(s, dir).events,
          keyCol = "user_id", tsCol = "ts", orderCol = "event_id",
          maxPerWindow = 2, windowDur = "1 hour")
        .select(col("event_id"), col("user_id"), col("win_start"),
          col("admitted"))
    },

    // --- circuit-breaker replay (circuit_breaker.rs) ----------------
    // connector := event_type, delivery ok := value >= 5.0 — a
    // deterministic outcome derivation so the replay is
    // hash-checkable; the operator takes any outcome log. The oracle
    // steps the same state machine with a linear recursive CTE.
    "g3_circuit_breaker" -> QueryDef.of(
      """WITH RECURSIVE ev AS (
        |  SELECT event_type AS connector, event_id, epoch_us(ts) AS us,
        |         (value >= 5.0) AS ok,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY event_id) AS rn
        |  FROM events
        |), step AS (
        |  SELECT connector, 0 AS rn, false AS open, 0 AS consec,
        |         CAST(0 AS BIGINT) AS opened_us,
        |         CAST(NULL AS BIGINT) AS event_id,
        |         CAST(NULL AS VARCHAR) AS decision
        |  FROM (SELECT DISTINCT connector FROM ev)
        |  UNION ALL
        |  SELECT e.connector, e.rn,
        |    CASE WHEN s.open AND e.us < s.opened_us + 3600000000 THEN true
        |         WHEN s.open THEN NOT e.ok
        |         WHEN (NOT e.ok) AND s.consec + 1 >= 3 THEN true
        |         ELSE false END,
        |    CASE WHEN s.open THEN 0
        |         WHEN e.ok THEN 0
        |         WHEN s.consec + 1 >= 3 THEN 0
        |         ELSE s.consec + 1 END,
        |    CASE WHEN s.open AND e.us < s.opened_us + 3600000000
        |           THEN s.opened_us
        |         WHEN s.open AND NOT e.ok THEN e.us
        |         WHEN s.open THEN CAST(0 AS BIGINT)
        |         WHEN (NOT e.ok) AND s.consec + 1 >= 3 THEN e.us
        |         ELSE s.opened_us END,
        |    e.event_id,
        |    CASE WHEN s.open AND e.us < s.opened_us + 3600000000
        |           THEN 'rejected'
        |         WHEN s.open THEN 'probe'
        |         ELSE 'sent' END
        |  FROM step s JOIN ev e ON e.connector = s.connector
        |                       AND e.rn = s.rn + 1
        |)
        |SELECT connector, event_id, decision,
        |       CASE WHEN open THEN 'open' ELSE 'closed' END AS state_after
        |FROM step WHERE rn > 0""".stripMargin) { (s, dir) =>
      Guardrails.circuitBreakerReplay(Tables(s, dir).events,
        connectorCol = "event_type", idCol = "event_id", tsCol = "ts",
        okCol = col("value") >= 5.0, threshold = 3, timeout = "1 hour")
    })
}
