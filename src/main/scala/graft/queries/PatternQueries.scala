package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.cep._

/** SASE+ pattern surface (SURVEY §2 #21–30): sequences, negation,
  * conjunction/disjunction, Kleene trend aggregation, earliest-match
  * (as-of) policy, and forecasting.
  */
object PatternQueries {

  private val US = 1000000L

  val defs: Map[String, QueryDef] = Map(

    // --- #21 two-step sequence, skip-till-any-match, within 30m ---
    "p1_seq2" -> QueryDef.of(
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        | a.user_id AS user_id, b.value AS b_value
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        SeqPattern(
          steps = Seq(
            Step("a", col("event_type") === "signup"),
            Step("b", col("event_type") === "purchase")),
          withinSec = 1800,
          partitionKeys = Seq("user_id"))
          .compile(Tables(s, dir).events)
          .select(col("a_event_id").as("a_id"), col("b_event_id").as("b_id"),
            col("a_user_id").as("user_id"), col("b_value").as("b_value"))
    },

    // --- #22 three-step sequence + cross-event predicate, within 8h ---
    "p2_seq3" -> QueryDef.of(
      """SELECT a.event_id AS a_id, b.event_id AS b_id, c.event_id AS c_id,
        | a.user_id AS user_id
        |FROM events a
        |JOIN events b ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 28800000000
        |JOIN events c ON b.user_id = c.user_id AND c.event_id > b.event_id
        | AND epoch_us(c.ts) - epoch_us(a.ts) <= 28800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'click'
        |  AND c.event_type = 'purchase' AND c.value > b.value""".stripMargin) {
      (s, dir) =>
        SeqPattern(
          steps = Seq(
            Step("a", col("event_type") === "signup"),
            Step("b", col("event_type") === "click"),
            Step("c", col("event_type") === "purchase")),
          withinSec = 28800,
          partitionKeys = Seq("user_id"))
          .compile(Tables(s, dir).events,
            crossPreds = Seq(col("c_value") > col("b_value")))
          .select(col("a_event_id").as("a_id"), col("b_event_id").as("b_id"),
            col("c_event_id").as("c_id"), col("a_user_id").as("user_id"))
    },

    // --- #24 negation: purchase NOT followed by error within 15m ---
    "p3_negation" -> QueryDef.of(
      """SELECT p.event_id AS p_id, p.user_id AS user_id
        |FROM events p
        |WHERE p.event_type = 'purchase' AND NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'error'
        |    AND e.event_id > p.event_id
        |    AND epoch_us(e.ts) - epoch_us(p.ts) <= 900000000)""".stripMargin) {
      (s, dir) =>
        SeqPattern(
          steps = Seq(Step("p", col("event_type") === "purchase")),
          withinSec = 900,
          partitionKeys = Seq("user_id"))
          .compileNegation(Tables(s, dir).events,
            Step("e", col("event_type") === "error"))
          .select(col("p_event_id").as("p_id"), col("p_user_id").as("user_id"))
    },

    // --- #25 AND: click & error within 10m of each other, any order ---
    "p4_and" -> QueryDef.of(
      """SELECT a.event_id AS click_id, b.event_id AS error_id,
        | a.user_id AS user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
        | AND a.event_id != b.event_id
        |WHERE a.event_type = 'click' AND b.event_type = 'error'""".stripMargin) {
      (s, dir) =>
        Pattern.conjunction(Tables(s, dir).events,
          Step("a", col("event_type") === "click"),
          Step("b", col("event_type") === "error"),
          withinSec = 600,
          partitionKeys = Seq("user_id"))
          .select(col("a_event_id").as("click_id"),
            col("b_event_id").as("error_id"),
            col("a_user_id").as("user_id"))
    },

    // --- #26 OR: disjunctive match, pure filter ---
    "p5_or" -> QueryDef.of(
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type = 'signup' OR (event_type = 'purchase' AND value > 150)""".stripMargin) {
      (s, dir) =>
        Pattern.disjunction(Tables(s, dir).events,
          col("event_type") === "signup",
          col("event_type") === "purchase" && col("value") > 150)
          .select("event_id", "user_id", "event_type")
    },

    // --- #27/#28 GRETA trend aggregation for error+ per user × 1h ---
    "p6_trend_count" -> QueryDef.of(
      """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS event_count,
        | CASE WHEN COUNT(*) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(*)) - 1, 0) AS BIGINT) END AS count_trends,
        | pow(2.0::DOUBLE, COUNT(*) - 1) * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_trends,
        | (pow(2.0::DOUBLE, COUNT(*) - 1) * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
        |   / CAST(CASE WHEN COUNT(*) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(*)) - 1, 0) AS BIGINT) END AS DOUBLE) AS avg_trends,
        | MIN(value) AS min_trends,
        | MAX(value) AS max_trends
        |FROM events WHERE event_type = 'error' GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        TrendAggregate.kleene(Tables(s, dir).events,
          pred = col("event_type") === "error",
          valueCol = col("value"),
          windowSize = "1 hour",
          partitionKeys = Seq("user_id"))
    },

    // --- predicate-constrained GRETA: E(value increasing)+ per user/day ---
    // oracle enumerates every strictly-increasing subsequence with a
    // recursive CTE (exponential, but bounded: ≤11 events per group)
    "p11_greta_pred" -> QueryDef.of(
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, (epoch_us(ts) // 86400000000) * 86400 AS win_start,
        |         event_id, value
        |  FROM events
        |), t AS (
        |  SELECT user_id, win_start, event_id, value,
        |         CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(28,2)) AS sum_vals
        |  FROM ev
        |  UNION ALL
        |  SELECT t.user_id, t.win_start, e.event_id, e.value,
        |         CAST(t.sum_vals + CAST(e.value AS DECIMAL(18,2)) AS DECIMAL(28,2))
        |  FROM t JOIN ev e ON e.user_id = t.user_id
        |    AND e.win_start = t.win_start
        |    AND e.event_id > t.event_id AND e.value > t.value
        |)
        |SELECT n.user_id, n.win_start, n.event_count,
        |       CAST(c.cnt AS BIGINT) AS count_trends,
        |       CAST(c.sv AS DOUBLE) AS sum_trends
        |FROM (SELECT user_id, win_start, COUNT(*) AS event_count
        |      FROM ev GROUP BY 1, 2) n
        |JOIN (SELECT user_id, win_start, COUNT(*) AS cnt, SUM(sum_vals) AS sv
        |      FROM t GROUP BY 1, 2) c
        |  ON n.user_id = c.user_id AND n.win_start = c.win_start""".stripMargin) {
      (s, dir) =>
        TrendAggregate.kleeneIncreasing(Tables(s, dir).events,
          pred = lit(true),
          valueCol = "value",
          windowSize = "1 day",
          partitionKeys = Seq("user_id"))
    },

    // --- Kleene+ detection: signup -> error+ -> purchase within 8h ---
    "p7_kleene" -> QueryDef.of(
      """SELECT a.event_id AS a_id, c.event_id AS c_id,
        | COUNT(b.event_id) AS n_b, MIN(b.event_id) AS first_b,
        | MAX(b.event_id) AS last_b,
        | CAST(SUM(CAST(b.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_b
        |FROM events a
        |JOIN events c ON a.user_id = c.user_id AND c.event_id > a.event_id
        | AND epoch_us(c.ts) - epoch_us(a.ts) <= 28800000000
        |JOIN events b ON b.user_id = a.user_id AND b.event_id > a.event_id
        | AND b.event_id < c.event_id AND b.event_type = 'error'
        |WHERE a.event_type = 'signup' AND c.event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        Pattern.kleeneBetween(Tables(s, dir).events,
          Step("a", col("event_type") === "signup"),
          Step("b", col("event_type") === "error"),
          Step("c", col("event_type") === "purchase"),
          withinSec = 28800,
          partitionKeys = Seq("user_id"),
          bValueCol = "value")
    },

    // --- Kleene* detection: signup -> error* -> purchase within 8h;
    //     empty B-runs survive with n_b = 0 (sase.rs skip states) ---
    "p12_kleene_star" -> QueryDef.of(
      """SELECT a.event_id AS a_id, c.event_id AS c_id,
        | COUNT(b.event_id) AS n_b, MIN(b.event_id) AS first_b,
        | MAX(b.event_id) AS last_b,
        | CAST(SUM(CAST(b.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_b
        |FROM events a
        |JOIN events c ON a.user_id = c.user_id AND c.event_id > a.event_id
        | AND epoch_us(c.ts) - epoch_us(a.ts) <= 28800000000
        |LEFT JOIN events b ON b.user_id = a.user_id AND b.event_id > a.event_id
        | AND b.event_id < c.event_id AND b.event_type = 'error'
        |WHERE a.event_type = 'signup' AND c.event_type = 'purchase'
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        Pattern.kleeneStarBetween(Tables(s, dir).events,
          Step("a", col("event_type") === "signup"),
          Step("b", col("event_type") === "error"),
          Step("c", col("event_type") === "purchase"),
          withinSec = 28800,
          partitionKeys = Seq("user_id"),
          bValueCol = "value")
    },

    // --- #23 earliest-match (as-of): first purchase after each signup ---
    "p8_seq_earliest" -> QueryDef.of(
      """SELECT a.event_id AS signup_id, MIN(b.event_id) AS purchase_id,
        | arg_min(b.value, b.event_id) AS purchase_value
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        |GROUP BY a.event_id""".stripMargin) {
      (s, dir) =>
        Pattern.earliestMatch(Tables(s, dir).events,
          Step("a", col("event_type") === "signup"),
          Step("b", col("event_type") === "purchase"),
          withinSec = 3600,
          partitionKeys = Seq("user_id"),
          carryB = Seq("value"))
          .select(col("event_id").as("signup_id"),
            col("__next_b.o").as("purchase_id"),
            col("__next_b.value").as("purchase_value"))
    },

    // --- per-transition within: signup -[any]-> click within 2h of
    // signup, then purchase within 30m OF THE CLICK (sase-patterns.md
    // "Per-Transition Constraints") ---
    "p9_transition_within" -> QueryDef.of(
      """SELECT a.event_id AS a_id, b.event_id AS b_id, c.event_id AS c_id
        |FROM events a
        |JOIN events b ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 28800000000
        |JOIN events c ON b.user_id = c.user_id AND c.event_id > b.event_id
        | AND epoch_us(c.ts) - epoch_us(a.ts) <= 28800000000
        | AND epoch_us(c.ts) - epoch_us(b.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'click'
        |  AND c.event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        SeqPattern(
          steps = Seq(
            Step("a", col("event_type") === "signup"),
            Step("b", col("event_type") === "click"),
            Step("c", col("event_type") === "purchase",
              withinPrevSec = Some(1800))),
          withinSec = 28800,
          partitionKeys = Seq("user_id"))
          .compile(Tables(s, dir).events)
          .select(col("a_event_id").as("a_id"), col("b_event_id").as("b_id"),
            col("c_event_id").as("c_id"))
    },

    // --- Hamlet-style multi-query sharing: trend aggregates for
    // SEVERAL Kleene patterns (error+, click+, purchase+) computed in
    // ONE pass / one shuffle via pivoted conditional aggregation —
    // the Spark form of hamlet/'s shared graphlet propagation ---
    "p10_multi_trend" -> QueryDef.of(
      """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
        | CASE WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'error' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_error,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        | CASE WHEN COUNT(CASE WHEN event_type = 'click' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'click' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_click,
        | CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        | CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_purchase
        |FROM events
        |WHERE event_type IN ('error', 'click', 'purchase')
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        TrendAggregate.kleeneShared(Tables(s, dir).events,
          patterns = Seq(
            "error" -> (col("event_type") === "error"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")),
          windowSize = "1 hour",
          partitionKeys = Seq("user_id"))
    },

    // --- #29 forecast: order-1 transition model (P(next | cur)) ---
    "f1_forecast" -> QueryDef.of(
      """WITH p AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        |  FROM events)
        |SELECT cur, nxt, COUNT(*) AS cnt,
        |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER (PARTITION BY cur) AS DOUBLE) AS prob
        |FROM p WHERE nxt IS NOT NULL GROUP BY cur, nxt""".stripMargin) {
      (s, dir) =>
        Forecast.transitions(Tables(s, dir).events)
    },

    // --- #29 PST variable-order model: contexts are count ratios, so
    // the probabilities are exact int divisions — hash-stable without
    // rounding ---
    "f2_pst" -> QueryDef.of(
      """WITH base AS (
        |  SELECT event_type AS nxt,
        |    lag(event_type, 1) OVER w AS l1,
        |    lag(event_type, 2) OVER w AS l2,
        |    lag(event_type, 3) OVER w AS l3
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), ctx AS (
        |  SELECT 1 AS depth, l1 AS context, nxt FROM base WHERE l1 IS NOT NULL
        |  UNION ALL
        |  SELECT 2, l2 || '>' || l1, nxt FROM base
        |    WHERE l1 IS NOT NULL AND l2 IS NOT NULL
        |  UNION ALL
        |  SELECT 3, l3 || '>' || l2 || '>' || l1, nxt FROM base
        |    WHERE l1 IS NOT NULL AND l2 IS NOT NULL AND l3 IS NOT NULL
        |)
        |SELECT depth, context, nxt, COUNT(*) AS cnt,
        |  CAST(COUNT(*) AS DOUBLE)
        |    / CAST(SUM(COUNT(*)) OVER (PARTITION BY depth, context) AS DOUBLE) AS prob
        |FROM ctx GROUP BY depth, context, nxt""".stripMargin) {
      (s, dir) =>
        Forecast.pstScores(Tables(s, dir).events, maxDepth = 3)
    },

    // --- #29 Hawkes self-exciting intensity (pst/hawkes.rs): the
    // O(1)-per-event recursion re-run by the oracle as a recursive
    // CTE (anchor = each key's first event at mu+alpha, one event per
    // key per iteration — standard SQL sequencing, see
    // HawkesAdaptiveOracle's scaladoc for why not a list_reduce
    // struct fold); exp() may differ in the last ulp across libms, so
    // both sides round to 6 places ---
    "f4_hawkes" -> QueryDef.of(
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events
        |), rec AS (
        |  SELECT user_id, event_id, rn, t AS lt, 0.003::DOUBLE AS li
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.rn, e.t AS lt,
        |    0.001::DOUBLE + (r.li - 0.001::DOUBLE + 0.002::DOUBLE)
        |      * exp(-0.0005::DOUBLE * CAST(e.t - r.lt AS DOUBLE) / 1e6::DOUBLE) AS li
        |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        |)
        |SELECT user_id, event_id, round(li, 6) AS intensity,
        |  round(least(greatest(li / 0.001::DOUBLE, 1.0::DOUBLE),
        |    5.0::DOUBLE), 6) AS boost_factor
        |FROM rec""".stripMargin) {
      (s, dir) =>
        Forecast.hawkesIntensity(Tables(s, dir).events,
          mu = 0.001, alpha = 0.002, beta = 0.0005)
          .select(col("user_id"), col("event_id"),
            round(col("intensity"), 6).as("intensity"),
            round(col("boost_factor"), 6).as("boost_factor"))
    },

    // --- #29 Hawkes with online EMA parameter estimation (the full
    // hawkes.rs recursion incl. estimate_parameters), under the same
    // prefix-fold oracle — the 8-field state is substituted textually
    // on both sides (HOF lambdas have no let-bindings) ---
    "f6_hawkes_adaptive" -> QueryDef.of(HawkesAdaptiveOracle.sql) {
      (s, dir) =>
        Forecast.hawkesIntensityAdaptive(Tables(s, dir).events)
          .select(col("user_id"), col("event_id"),
            round(col("intensity"), 6).as("intensity"),
            round(col("boost_factor"), 6).as("boost_factor"))
    },

    // --- #29 conformal prediction intervals (pst/conformal.rs):
    // [p−q, p+q] from the trailing-window quantile of |p − outcome| ---
    "f5_conformal" -> QueryDef.of(
      """WITH pairs AS (
        |  SELECT user_id, event_id, event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS nxt
        |  FROM events),
        |p2 AS (SELECT * FROM pairs WHERE nxt IS NOT NULL),
        |model AS (
        |  SELECT cur,
        |    SUM(CASE WHEN nxt = 'purchase' THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END)
        |      / CAST(COUNT(*) AS DOUBLE) AS p
        |  FROM p2 GROUP BY cur),
        |scored AS (
        |  SELECT p2.user_id, p2.event_id, model.p,
        |    abs(model.p - CASE WHEN p2.nxt = 'purchase'
        |      THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END) AS score
        |  FROM p2 JOIN model ON p2.cur = model.cur),
        |conf AS (
        |  SELECT user_id, event_id, round(p, 6) AS p,
        |    round(quantile_cont(score, 0.9) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING), 6) AS q
        |  FROM scored)
        |SELECT user_id, event_id, p,
        |  coalesce(greatest(p - q, 0.0::DOUBLE), 0.0::DOUBLE) AS lo,
        |  coalesce(least(p + q, 1.0::DOUBLE), 1.0::DOUBLE) AS hi
        |FROM conf""".stripMargin) {
      (s, dir) =>
        Forecast.conformalIntervals(Tables(s, dir).events, "purchase")
    },

    // --- #29 live forecast: every event annotated with its pattern-
    // completion probability from the deepest matching PST context
    // (the forecast_probability / forecast_state builtins). The model
    // only contains contexts with >0 target continuations (pstScores
    // groups on (ctx, nxt)), hence the HAVING; probabilities are
    // exact count ratios, so no rounding is needed ---
    "f3_forecast_live" -> QueryDef.of(
      """WITH base AS (
        |  SELECT event_type AS nxt,
        |    lag(event_type, 1) OVER w AS l1,
        |    lag(event_type, 2) OVER w AS l2
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), ctxrows AS (
        |  SELECT 1 AS depth, l1 AS context, nxt FROM base WHERE l1 IS NOT NULL
        |  UNION ALL
        |  SELECT 2, l2 || '>' || l1, nxt FROM base
        |    WHERE l1 IS NOT NULL AND l2 IS NOT NULL
        |), model AS (
        |  SELECT depth, context,
        |    CAST(COUNT(*) FILTER (nxt = 'purchase') AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS prob
        |  FROM ctxrows GROUP BY depth, context
        |  HAVING COUNT(*) FILTER (nxt = 'purchase') > 0
        |), ev AS (
        |  SELECT user_id, event_id, event_type AS c1,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS p1
        |  FROM events
        |), j AS (
        |  SELECT e.user_id, e.event_id, e.c1 AS ctx1,
        |    CASE WHEN e.p1 IS NULL THEN e.c1 ELSE e.p1 || '>' || e.c1 END AS ctx2,
        |    m2.prob AS pr2, m1.prob AS pr1
        |  FROM ev e
        |  LEFT JOIN model m2 ON m2.depth = 2
        |    AND m2.context = (CASE WHEN e.p1 IS NULL THEN e.c1
        |                           ELSE e.p1 || '>' || e.c1 END)
        |  LEFT JOIN model m1 ON m1.depth = 1 AND m1.context = e.c1
        |)
        |SELECT event_id, user_id,
        |  coalesce(pr2, pr1, 0.0::DOUBLE) AS forecast_probability,
        |  CASE WHEN pr2 IS NOT NULL THEN ctx2 ELSE ctx1 END AS forecast_state
        |FROM j""".stripMargin) {
      (s, dir) =>
        Forecast.forecastPattern(s, Tables(s, dir).events, "purchase",
          maxDepth = 2)
          .select("event_id", "user_id", "forecast_probability",
            "forecast_state")
    })
}

/** DuckDB oracle for f6: the adaptive-Hawkes per-event recursion,
  * mirroring [[graft.cep.Forecast.hawkesIntensityAdaptive]] (same
  * association order → the only cross-engine divergence is exp()'s
  * last ulp, absorbed by round 6 on both sides).
  *
  * Realized as a RECURSIVE CTE advancing every key one event per
  * iteration — NOT as a `list_reduce` struct fold: DuckDB 1.0
  * evaluates struct-literal lambda results field-by-field against a
  * shared accumulator buffer, so a multi-field state (this one has
  * eight) reads a mix of pre-/post-update values depending on field
  * order (observed empirically; the single-dependency f4 fold is
  * unaffected and verified exact). The recursive arm references only
  * the previous iteration's row `r` — unambiguous sequencing.
  * Helper subexpressions (dt_, ed1_, …) are DuckDB lateral column
  * aliases, defined left-to-right in the inner select.
  */
private object HawkesAdaptiveOracle {
  val sql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t,
      |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      |  FROM events
      |), rec AS (
      |  SELECT user_id, event_id, rn, t AS lt,
      |    1.5::DOUBLE AS i, 1.5::DOUBLE AS b, 1.5::DOUBLE AS li,
      |    0.0::DOUBLE AS ed, 0.0::DOUBLE AS ed2, 1::BIGINT AS n,
      |    1.0::DOUBLE AS mu, 0.5::DOUBLE AS al, 1.0::DOUBLE AS be
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT user_id, event_id, rn, t AS lt,
      |    CASE WHEN est_ THEN greatest(iraw_, mun_) ELSE iraw_ END AS i,
      |    least(greatest(i / mun_, 1.0::DOUBLE), 5.0::DOUBLE) AS b,
      |    i AS li,
      |    ed1_ AS ed, ed2n_ AS ed2, n0 + 1 AS n,
      |    mun_ AS mu,
      |    CASE WHEN est_ THEN 0.5::DOUBLE * mun_ ELSE al0 END AS al,
      |    CASE WHEN est_ AND varn_ > 0.0::DOUBLE
      |      THEN greatest(1.0::DOUBLE / sqrt(varn_), 1e-15::DOUBLE)
      |      ELSE be0 END AS be
      |  FROM (
      |    SELECT e.user_id, e.event_id, e.rn, e.t,
      |      r.n AS n0, r.al AS al0, r.be AS be0,
      |      greatest(CAST(e.t - r.lt AS DOUBLE) / 1e6::DOUBLE, 0.0::DOUBLE) AS dt_,
      |      CASE WHEN r.n = 1 THEN dt_
      |        ELSE 0.05::DOUBLE * dt_ + 0.95::DOUBLE * r.ed END AS ed1_,
      |      CASE WHEN r.n = 1 THEN dt_ * dt_
      |        ELSE 0.05::DOUBLE * dt_ * dt_ + 0.95::DOUBLE * r.ed2 END AS ed2n_,
      |      r.mu + (r.li - r.mu + r.al) * exp(-r.be * dt_) AS iraw_,
      |      (r.n + 1) >= 10 AS est_,
      |      CASE WHEN (r.n + 1) >= 10
      |        THEN greatest(1.0::DOUBLE / ed1_, 1e-15::DOUBLE) ELSE r.mu END AS mun_,
      |      ed2n_ - ed1_ * ed1_ AS varn_
      |    FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
      |  ) s
      |)
      |SELECT user_id, event_id, round(i, 6) AS intensity,
      |  round(b, 6) AS boost_factor
      |FROM rec""".stripMargin
}
