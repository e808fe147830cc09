package graft.queries

import graft.vpl.Vpl

/** VPL-front-end queries: each runs a VPL program text through the
  * full parser + compiler ([[graft.vpl.VplParser]] /
  * [[graft.vpl.VplCompiler]]) against the events table, and carries a
  * DuckDB oracle over the same parquet — so the driver's hash gate
  * exercises the whole front-end path, not just the operators.
  *
  * Reference surface: examples/sase_patterns.vpl and
  * docs/language/grammar.md; the end-to-end scenario replays (the
  * reference's own .vpl + .evt pairs) live in VplSpec.
  */
object VplQueries {

  private val seqVpl =
    """# sequence with cross-step predicate, bounded by .within
      |stream SignupThenPurchase = signup as a
      |    -> purchase where user_id == a.user_id as b
      |    .within(30m)
      |    .emit(user_id: a.user_id, a_id: a.event_id, b_id: b.event_id, amount: b.value)
      |""".stripMargin

  private val aggVpl =
    """# partitioned tumbling-window aggregate with post-agg filter
      |stream PurchaseVolume = purchase
      |    .partition_by(user_id)
      |    .window(1h)
      |    .aggregate(n: count(), total: sum(value))
      |    .where(total > 50.0)
      |    .emit(user_id: user_id, win_start: win_start, n: n, total: total)
      |""".stripMargin

  private val negVpl =
    """# negation: purchases with no error for the same user within 15m
      |stream PurchaseNoError = purchase as p
      |    .within(15m)
      |    .not(error where user_id == p.user_id)
      |    .emit(user_id: p.user_id, a_id: p.event_id)
      |""".stripMargin

  private val joinVpl =
    """# stream-stream join of two windowed aggregates on (key, window)
      |stream HourlyPurchases = purchase
      |    .partition_by(user_id) .window(1h)
      |    .aggregate(n_p: count(), v_p: sum(value))
      |stream HourlyErrors = error
      |    .partition_by(user_id) .window(1h)
      |    .aggregate(n_e: count())
      |stream HourlyJoined = join(HourlyPurchases, HourlyErrors)
      |    .on(HourlyPurchases.user_id == HourlyErrors.user_id and
      |        HourlyPurchases.win_start == HourlyErrors.win_start)
      |    .emit(user_id: HourlyPurchases.user_id,
      |          win_start: HourlyPurchases.win_start,
      |          n_p: HourlyPurchases.n_p, v_p: HourlyPurchases.v_p,
      |          n_e: HourlyErrors.n_e)
      |""".stripMargin

  private val exprVpl =
    """# the documented expression-operator surface end to end:
      |# bitwise, shifts, ??, ranges, in/not in, slices, substring-in
      |stream ExprSurface = purchase
      |    .emit(event_id: event_id,
      |          masked: (event_id & 255) | 1,
      |          x: event_id ^ 1023,
      |          shifted: (event_id << 3) >> 1,
      |          inv: ~event_id,
      |          lowuser: user_id in 0..100,
      |          tenuser: user_id in 0..=10,
      |          nin: user_id not in [1, 2, 3],
      |          dev: missing_field ?? "unknown",
      |          tag: props[0:4],
      |          last_ch: props[-1],
      |          has_k: "k" in props,
      |          cat: match user_id % 3:
      |              0 => "a"
      |              1 => "b"
      |              _ => "c",
      |          lbl: "u" + str(user_id),
      |          uid2: int(str(user_id)))
      |""".stripMargin

  private val trendVpl =
    """# GRETA aggregation mode: count anchored rising trends without
      |# enumerating them (docs/reference/trend-aggregation.md)
      |stream SignupTrends = signup as first
      |    -> all purchase where value > first.value as rising
      |    .within(24h)
      |    .partition_by(user_id)
      |    .trend_aggregate(trend_count: count_trends(),
      |                     event_count: count_events(rising))
      |    .emit(user_id: user_id, win_start: win_start,
      |          trend_count: trend_count, event_count: event_count)
      |""".stripMargin

  private val enrichVpl =
    """# broadcast lookup enrichment with fallback (enrichment/)
      |stream EnrichedPurchases = purchase as e
      |    .enrich(CustomerDB, key: user_id, fields: [c_name, c_mktsegment], fallback: "unknown")
      |    .emit(event_id: e.event_id, user_id: e.user_id,
      |          cust_name: c_name, segment: c_mktsegment,
      |          status: enrich_status)
      |""".stripMargin

  private val httpEnrichVpl =
    """# enrichment through the HTTP provider (enrichment/http.rs):
      |# the CustomerAPI connector is a bound http connector — the
      |# compiler resolves the lookup from the endpoint itself
      |stream EnrichedPurchases = purchase as e
      |    .enrich(CustomerAPI, key: user_id, fields: [c_name, c_mktsegment], fallback: "unknown")
      |    .emit(event_id: e.event_id, user_id: e.user_id,
      |          cust_name: c_name, segment: c_mktsegment,
      |          status: enrich_status)
      |""".stripMargin

  private val analyticsVpl =
    """# analytic window builtins (docs/language/builtins.md Window
      |# Functions — documented in the reference but unimplemented in
      |# its runtime; graft compiles them to Spark window functions)
      |stream PurchaseAnalytics = purchase
      |    .partition_by(user_id)
      |    .emit(event_id: event_id, user_id: user_id,
      |          rn: row_number(),
      |          rk: rank(value),
      |          prev_value: lag(value, 1),
      |          next_value: lead(value),
      |          delta: value - lag(value, 1))
      |""".stripMargin

  private[graft] val stmtFnVpl =
    """# per-event imperative fn body (while/:=/if) over an EVENT FIELD
      |# (varpulis.pest statement grammar; the reference interprets the
      |# body per event) — compiles to the fuel-capped row-level fold
      |fn collatz_steps(v: int) -> int:
      |    let n = v
      |    let k = 0
      |    while n > 1:
      |        if n % 2 == 0:
      |            n := n / 2
      |        else:
      |            n := 3 * n + 1
      |        k := k + 1
      |    return k
      |
      |stream CollatzSteps = purchase
      |    .emit(event_id: event_id,
      |          seed: to_int(floor(value)) % 97 + 1,
      |          steps: collatz_steps(to_int(floor(value)) % 97 + 1))
      |""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    // per-event imperative statement body under the hash gate: the
    // oracle re-runs the while-loop as a DuckDB recursive CTE (the
    // f4/g3 recursive-CTE precedent), one iteration per step
    "x8_vpl_stmt_fn" -> QueryDef.of(
      """WITH RECURSIVE base AS (
        |  SELECT event_id, CAST(FLOOR(value) AS BIGINT) % 97 + 1 AS seed
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT event_id, seed, seed AS n, 0 AS k FROM base
        |  UNION ALL
        |  SELECT event_id, seed,
        |    CASE WHEN n % 2 = 0 THEN n // 2 ELSE 3 * n + 1 END, k + 1
        |  FROM c WHERE n > 1
        |)
        |SELECT event_id, seed, CAST(MAX(k) AS BIGINT) AS steps
        |FROM c GROUP BY 1, 2""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, stmtFnVpl, "CollatzSteps")),
    // `.enrich` through the FULL front end: the connector binds the
    // customer table (key column renamed to the VPL key), broadcast
    // left join + fallback coalesce — e1's semantics reached from
    // .vpl text (the lookup misses get 'fallback' status)
    "x7_vpl_enrich" -> QueryDef.of(
      """SELECT event_id, user_id,
        | COALESCE(c_name, 'unknown') AS cust_name,
        | COALESCE(c_mktsegment, 'unknown') AS segment,
        | CASE WHEN c_name IS NULL THEN 'fallback' ELSE 'ok' END AS status
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        Vpl.tableStream(s, dir, enrichVpl, "EnrichedPurchases",
          lookups = Map("CustomerDB" -> graft.Tables(s, dir).customer
            .withColumnRenamed("c_custkey", "user_id")
            .select("user_id", "c_name", "c_mktsegment")))
    },
    // `.enrich` resolved THROUGH the HTTP provider (enrichment/
    // http.rs): a loopback server serves the customer dim as
    // `GET ?key=K` JSON; the compiler collects the stream's DISTINCT
    // keys (bounded), fetches each once (a perfectly-warm cache.rs),
    // and broadcast-joins the fetched frame. Same oracle as x7 —
    // identical semantics, point-lookup transport
    "x10_vpl_http_enrich" -> QueryDef.of(
      """SELECT event_id, user_id,
        | COALESCE(c_name, 'unknown') AS cust_name,
        | COALESCE(c_mktsegment, 'unknown') AS segment,
        | CASE WHEN c_name IS NULL THEN 'fallback' ELSE 'ok' END AS status
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |WHERE event_type = 'purchase'""".stripMargin) { (s, dir) =>
      // the loopback dim service: customer is a bounded dimension
      // (this collect backs the TEST endpoint, not the operator —
      // production points at a real enrichment service)
      val cust = graft.Tables(s, dir).customer
        .select("c_custkey", "c_name", "c_mktsegment").collect()
        .map(r => r.get(0).toString -> (r.getString(1), r.getString(2)))
        .toMap
      // Nagle + delayed-ACK on the JDK server's keep-alive responses
      // costs ~40 ms per request (1500 keys read 9 s); TCP_NODELAY
      // brings the fetch to ~0.3 s warm
      System.setProperty("sun.net.httpserver.nodelay", "true")
      val srv = com.sun.net.httpserver.HttpServer.create(
        new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      // without an executor the JDK server answers on ONE dispatcher
      // thread and the 8-way fetch pool serializes behind it
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
        r => { val t = new Thread(r, "graft-x10-dim"); t.setDaemon(true); t })
      srv.setExecutor(pool)
      srv.createContext("/lookup", (x: com.sun.net.httpserver.HttpExchange) => {
        val q = Option(x.getRequestURI.getQuery).getOrElse("")
        val key = q.split("&").collectFirst {
          case kv if kv.startsWith("key=") => java.net.URLDecoder
            .decode(kv.drop(4), "UTF-8")
        }.getOrElse("")
        key match {
          case k if cust.contains(k) =>
            val (name, seg) = cust(k)
            val om = new com.fasterxml.jackson.databind.ObjectMapper()
            val o = om.createObjectNode()
            o.put("c_name", name); o.put("c_mktsegment", seg)
            val body = om.writeValueAsBytes(o)
            x.getResponseHeaders.add("Content-Type", "application/json")
            x.sendResponseHeaders(200, body.length.toLong)
            x.getResponseBody.write(body); x.close()
          case _ =>
            x.sendResponseHeaders(404, -1L); x.close()
        }
      })
      srv.start()
      try {
        val url = s"http://127.0.0.1:${srv.getAddress.getPort}/lookup"
        val conn = graft.sources.HttpConnector("CustomerAPI",
          spoolDir = java.nio.file.Files
            .createTempDirectory("graft_httpenrich_").toString,
          sinkUrl = url)
        // the provider fetch happens at compile, so the frame that
        // returns here carries the lookup rows locally — the server
        // can stop before the plan ever executes
        Vpl.tableStreamConns(s, dir, httpEnrichVpl, "EnrichedPurchases",
          sourceConns = Map("CustomerAPI" -> conn))
      } finally { srv.stop(0); pool.shutdown() }
    },
    // anchored GRETA closed forms under the hash gate: the oracle
    // recomputes n_a per anchor with a correlated join and sums the
    // exact powers (DuckDB << on BIGINT; >62 guards to NULL like the
    // engine's overflow contract)
    "x6_vpl_trend_agg" -> QueryDef.of(
      """WITH a AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'signup'
        |), n AS (
        |  SELECT a.user_id,
        |    (epoch_us(a.ts) // 86400000000) * 86400 AS win_start,
        |    a.event_id,
        |    COUNT(b.event_id) AS n_b
        |  FROM a LEFT JOIN events b
        |    ON b.user_id = a.user_id AND b.event_type = 'purchase'
        |   AND b.event_id > a.event_id
        |   AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 86400000000
        |   AND b.value > a.value
        |  GROUP BY 1, 2, 3
        |)
        |SELECT user_id, win_start,
        |  CAST(SUM(CASE WHEN n_b = 0 THEN 0
        |       WHEN n_b <= 62 THEN (CAST(1 AS BIGINT) << n_b) - 1
        |       END) AS BIGINT) AS trend_count,
        |  CAST(SUM(CASE WHEN n_b = 0 THEN 0
        |       WHEN n_b - 1 <= 62 THEN n_b * (CAST(1 AS BIGINT) << (n_b - 1))
        |       END) AS BIGINT) AS event_count
        |FROM n GROUP BY 1, 2
        |HAVING SUM(n_b) > 0""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, trendVpl, "SignupTrends")),
    "x9_vpl_analytics" -> QueryDef.of(
      """SELECT event_id, user_id,
        | row_number() OVER w AS rn,
        | rank() OVER (PARTITION BY user_id ORDER BY value) AS rk,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | value - lag(value, 1) OVER w AS delta
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, analyticsVpl, "PurchaseAnalytics")),
    "x5_vpl_exprs" -> QueryDef.of(
      """SELECT event_id,
        | (event_id & 255) | 1 AS masked,
        | xor(event_id, 1023) AS x,
        | (event_id << 3) >> 1 AS shifted,
        | -event_id - 1 AS inv,
        | (user_id >= 0 AND user_id < 100) AS lowuser,
        | (user_id >= 0 AND user_id <= 10) AS tenuser,
        | user_id NOT IN (1, 2, 3) AS nin,
        | 'unknown' AS dev,
        | substring(props, 1, 4) AS tag,
        | substr(props, length(props), 1) AS last_ch,
        | contains(props, 'k') AS has_k,
        | CASE user_id % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS cat,
        | 'u' || CAST(user_id AS VARCHAR) AS lbl,
        | CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS uid2
        |FROM events WHERE event_type = 'purchase'""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, exprVpl, "ExprSurface")),
    "x1_vpl_seq" -> QueryDef.of(
      """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
        | b.value AS amount
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, seqVpl, "SignupThenPurchase")),

    "x2_vpl_agg" -> QueryDef.of(
      """SELECT user_id,
        | (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1, 2 HAVING total > 50.0""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, aggVpl, "PurchaseVolume")),

    "x4_vpl_join" -> QueryDef.of(
      """WITH p AS (
        |  SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        |    COUNT(*) AS n_p,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS v_p
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |e AS (
        |  SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        |    COUNT(*) AS n_e
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
        |SELECT p.user_id AS user_id, p.win_start AS win_start,
        |       p.n_p, p.v_p, e.n_e
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND p.win_start = e.win_start""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, joinVpl, "HourlyJoined")),

    "x3_vpl_negation" -> QueryDef.of(
      """SELECT p.user_id AS user_id, p.event_id AS a_id
        |FROM events p
        |WHERE p.event_type = 'purchase' AND NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'error'
        |    AND e.event_id > p.event_id
        |    AND epoch_us(e.ts) - epoch_us(p.ts) <= 900000000)""".stripMargin)(
      (s, dir) => Vpl.tableStream(s, dir, negVpl, "PurchaseNoError")))
}
