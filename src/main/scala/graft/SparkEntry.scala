package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator in SURVEY.md §2 has an entry in [[queries]]; those
  * with a SQL-expressible semantics also appear in [[oracleSql]]
  * (DuckDB, hash-compared by the driver at sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q1_agg").build(spark, "/root/testdata/sf0.001")

  private val streamingDefs: Map[String, QueryDef] = Map(
    // guardrail twins: watermark-finalized decisions equal the batch
    // operators row for row, so each shares its batch oracle verbatim
    "s21_stream_rate_limit" -> QueryDef(
      graft.streaming.StreamingQueries.streamRateLimit,
      GuardrailQueries.defs("g2_rate_limit").oracle),
    "s22_stream_breaker" -> QueryDef(
      graft.streaming.StreamingQueries.streamBreaker,
      GuardrailQueries.defs("g3_circuit_breaker").oracle),
    // s25: ingest-time quality gating — stateless battery, shares
    // t12's oracle verbatim
    "s25_stream_gopher" -> QueryDef(
      graft.streaming.StreamingQueries.streamGopher,
      TextQueries.defs("t12_gopher_filters").oracle),
    // s26: ingest-time DSIR scoring — pre-fit model, row-local native
    // scorer, bit-identical to batch: shares t13's oracle verbatim
    "s26_stream_dsir" -> QueryDef(
      graft.streaming.StreamingQueries.streamDsir,
      TextQueries.defs("t13_dsir").oracle),
    // s37: sliding-window chunking at ingest — stateless generator
    // fan-out, shares t18's oracle verbatim
    "s37_stream_chunk" -> QueryDef(
      graft.streaming.StreamingQueries.streamChunk,
      TextQueries.defs("t18_chunk").oracle),
    // s38: ingest-time bigram-LM fluency gate — pre-fit integer
    // model, row-local native scorer: shares t17's oracle verbatim
    "s38_stream_lm_fluency" -> QueryDef(
      graft.streaming.StreamingQueries.streamLmFluency,
      TextQueries.defs("t17_lm_fluency").oracle),
    // s41: CCNet tier assignment at ingest — pre-fit LM + pre-fit
    // per-language tertile thresholds, row-local map-literal lookup:
    // shares t19's oracle verbatim
    "s41_stream_ccnet" -> QueryDef(
      graft.streaming.StreamingQueries.streamCcnet,
      TextQueries.defs("t19_ccnet_buckets").oracle),
    // s39: per-event imperative fn fold at ingest (the r13 StmtFnCall
    // path on a live stream) — stateless row-local, integer-exact:
    // shares x8's recursive-CTE oracle verbatim
    "s39_stream_stmt_fn" -> QueryDef(
      graft.streaming.StreamingQueries.streamStmtFn,
      VplQueries.defs("x8_vpl_stmt_fn").oracle),
    // s40: incremental dedup of a live crawl delta against the
    // standing corpus — per-fp O(1) first-occurrence state over a
    // stream-static fingerprint join; shares d10's oracle verbatim
    "s40_stream_incremental_dedup" -> QueryDef(
      graft.streaming.StreamingQueries.streamIncrementalDedup,
      TextQueries.defs("d10_incremental_dedup").oracle),
    // s27: multimodal frame sampling at ingest — stateless generator
    // fan-out, shares m3's oracle verbatim
    "s27_stream_frames" -> QueryDef(
      graft.streaming.StreamingQueries.streamFrames,
      TextQueries.defs("m3_frame_sample").oracle),
    // s28: PII redaction at ingest — stateless zero-shuffle map,
    // shares t5's oracle verbatim
    "s28_stream_pii" -> QueryDef(
      graft.streaming.StreamingQueries.streamPii,
      TextQueries.defs("t5_pii_redact").oracle),
    // s30: BM25 scoring at ingest — pre-fit corpus stats as literals
    // in the shared score builder, shares t11's oracle verbatim
    "s30_stream_bm25" -> QueryDef(
      graft.streaming.StreamingQueries.streamBm25,
      TextQueries.defs("t11_bm25").oracle),
    // s32: online Hawkes intensity — the recursion's O(1) per-key
    // carry in fMGWS state, stepping through the SAME
    // HawkesFoldUtil.step as the batch fold: shares f4's oracle
    "s32_stream_hawkes" -> QueryDef(
      graft.streaming.StreamingQueries.streamHawkes,
      PatternQueries.defs("f4_hawkes").oracle),
    // s35: as-of (SCD) enrichment at ingest — latest-dim-state per
    // key in fMGWS state, facts attach it in finalized event-time
    // order: shares e2's oracle verbatim
    "s35_stream_asof_enrich" -> QueryDef(
      graft.streaming.StreamingQueries.streamAsofEnrich,
      CoreQueries.defs("e2_asof_enrich").oracle),
    // shared multi-query detection: each tag held to its single-query
    // join oracle (zdd_unified's sharing claim, checked per pattern)
    "s23_stream_multi_pattern" -> QueryDef.of(
      """SELECT 'purchase_after_signup' AS pattern, a.user_id AS user_id,
        | a.event_id AS a_id, b.event_id AS b_id,
        | epoch_us(b.ts) - epoch_us(a.ts) AS span_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
        |UNION ALL
        |SELECT 'error_after_signup' AS pattern, a.user_id,
        | a.event_id, b.event_id,
        | epoch_us(b.ts) - epoch_us(a.ts)
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'error'""".stripMargin)(
      graft.streaming.StreamingQueries.streamMultiPattern),
    "s1_stream_tumbling" -> QueryDef.of(
      """SELECT event_type,
        | (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamTumbling),
    "s2_stream_pattern" -> QueryDef.of(
      """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
        | epoch_us(b.ts) - epoch_us(a.ts) AS span_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'""".stripMargin)(
      graft.streaming.StreamingQueries.streamPattern),
    "s3_stream_join" -> QueryDef.of(
      """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id,
        | epoch_us(b.ts) - epoch_us(a.ts) AS span_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.event_id > a.event_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) <= 1800000000
        |WHERE a.event_type = 'signup' AND b.event_type = 'purchase'""".stripMargin)(
      graft.streaming.StreamingQueries.streamStreamJoin),
    // the staged end-of-stream sentinel flushes all append-mode state,
    // so both stateful streaming queries share their batch twins'
    // oracles (negation → p3's anti-join, sessions → w3's
    // gaps-and-islands).
    // s4 is micro-batch-split-safe: detectAbsence buffers events in
    // state and applies them in event_id order only once the
    // watermark finalizes them, so the oracle holds under any
    // maxFilesPerTrigger (spec: "streaming negation is batch-split
    // invariant").
    "s4_stream_negation" -> QueryDef.of(
      """SELECT p.user_id AS user_id, p.event_id AS a_id
        |FROM events p
        |WHERE p.event_type = 'purchase' AND NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'error'
        |    AND e.event_id > p.event_id
        |    AND epoch_us(e.ts) - epoch_us(p.ts) <= 900000000)""".stripMargin)(
      graft.streaming.StreamingQueries.streamNegation),
    // s6 shares p7's kleeneBetween oracle: the streaming NFA's Kleene
    // loop step must reproduce the batch anchor-pair aggregation
    "s6_stream_kleene" -> QueryDef.of(
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
        |GROUP BY 1, 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamKleene),
    // s11 shares w8's trailing-window z-score oracle
    "s11_stream_anomaly" -> QueryDef.of(
      """WITH r AS (
        |  SELECT user_id, event_id, value,
        |    COUNT(*) OVER f AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER f AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) OVER f AS DOUBLE) AS sxx
        |  FROM events
        |  WINDOW f AS (PARTITION BY user_id ORDER BY event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, value,
        |  round((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z,
        |  abs((value - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1))) > 3.0 AS is_anomaly
        |FROM r WHERE n >= 5""".stripMargin)(
      graft.streaming.StreamingQueries.streamAnomaly),
    // s10 shares w4's count-window oracle (complete windows only —
    // exactly when a streaming count window emits)
    "s10_stream_count_window" -> QueryDef.of(
      """WITH r AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
        |  MIN(event_id) AS first_id, MAX(event_id) AS last_id,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM r GROUP BY user_id, (rn - 1) // 10 HAVING COUNT(*) = 10""".stripMargin)(
      graft.streaming.StreamingQueries.streamCountWindow),
    // s9: per-event running EMA — the oracle folds each row's ordered
    // value prefix (list_reduce seeds with the first element, the
    // same seed-first recursion the stream applies in event_id order)
    "s9_stream_ema" -> QueryDef.of(
      """WITH lst AS (
        |  SELECT user_id, list(value ORDER BY event_id) AS xs
        |  FROM events GROUP BY user_id
        |), ev AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events
        |)
        |SELECT e.user_id, e.event_id,
        |  list_reduce(l.xs[1:e.rn],
        |    (acc, x) -> (2.0::DOUBLE / 11.0::DOUBLE) * x +
        |      (1.0::DOUBLE - 2.0::DOUBLE / 11.0::DOUBLE) * acc) AS ema10
        |FROM ev e JOIN lst l USING (user_id)""".stripMargin)(
      graft.streaming.StreamingQueries.streamEma),
    // s7/s8: streaming AND (symmetric interval join) and OR
    // (stateless pushed filter), sharing p4's / p5's oracles
    "s7_stream_and" -> QueryDef.of(
      """SELECT a.event_id AS click_id, b.event_id AS error_id,
        | a.user_id AS user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000
        | AND a.event_id != b.event_id
        |WHERE a.event_type = 'click' AND b.event_type = 'error'""".stripMargin)(
      graft.streaming.StreamingQueries.streamConjunction),
    // s18: streaming stratified sampling (stateless deterministic
    // filter), sharing t7's oracle
    "s18_stream_sample" -> QueryDef.of(
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |    CAST(${graft.queries.TextQueries.fnvSqlPub("('mix|' || CAST(doc_id AS VARCHAR))")} % 1000000 AS BIGINT) AS bucket,
         |    CASE WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) < 5 THEN 900000
         |         WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) < 10 THEN 600000
         |         WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) < 15 THEN 300000
         |         ELSE 120000 END AS rate_ppm
         |  FROM documents)
         |SELECT doc_id, source, bucket, CAST(rate_ppm AS BIGINT) AS rate_ppm
         |FROM s WHERE bucket < rate_ppm""".stripMargin)(
      graft.streaming.StreamingQueries.streamSample),
    // s36: streaming temperature resampling — rates pre-fit on the
    // static corpus through t16's exact integer derivation, applied
    // as a stateless ingest filter; shares t16's oracle verbatim
    "s36_stream_temperature" -> QueryDef.of(
      graft.queries.TextQueries.defs("t16_temperature_mix").oracle.get)(
      graft.streaming.StreamingQueries.streamTemperature),
    // s24: streaming greedy sequence packing — per-shard (bin, used)
    // state folding arrivals through the batch expression's step
    // function; shares t10's recursive-CTE oracle row for row
    "s24_stream_pack" -> QueryDef.of(
      graft.queries.TextQueries.seqPackOracle)(
      graft.streaming.StreamingQueries.streamPack),
    "s8_stream_or" -> QueryDef.of(
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type = 'signup' OR (event_type = 'purchase' AND value > 150)""".stripMargin)(
      graft.streaming.StreamingQueries.streamDisjunction),
    // s14: streaming sliding windows under w2's oracle
    "s14_stream_sliding" -> QueryDef.of(
      """SELECT event_type,
        | ((epoch_us(ts) // 1800000000) - k) * 1800 AS win_start,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
        |GROUP BY 1, 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamSliding),
    // s17: streaming heavy hitters (rank at window close), sharing
    // a5's oracle
    "s17_stream_heavy_hitters" -> QueryDef.of(
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT win_start, event_type, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY win_start
        |    ORDER BY n DESC, event_type) AS rk FROM c)
        |WHERE rk <= 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamHeavyHitters),
    // s20: ONLINE PST forecast — live per-key transition counts; the
    // model at event i is exactly "all transitions with event_id
    // below i", so the oracle re-derives it with prefix window counts
    // over depth-1 and depth-2 contexts (longest context with support
    // wins; integer-ratio doubles are bit-exact)
    "s20_stream_forecast_online" -> QueryDef.of(
      """WITH o AS (
        |  SELECT event_id, user_id, event_type,
        |    lag(event_type, 1) OVER w AS p1,
        |    lag(event_type, 2) OVER w AS p2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), c AS (
        |  SELECT *, p1 AS ctx1,
        |    CASE WHEN p2 IS NOT NULL THEN p2 || '>' || p1 END AS ctx2
        |  FROM o
        |), w2 AS (
        |  SELECT *,
        |    CASE WHEN ctx1 IS NOT NULL THEN COUNT(*) OVER (PARTITION BY user_id, ctx1 ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS den1,
        |    CASE WHEN ctx1 IS NOT NULL THEN COUNT(*) OVER (PARTITION BY user_id, ctx1, event_type ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS num1,
        |    CASE WHEN ctx2 IS NOT NULL THEN COUNT(*) OVER (PARTITION BY user_id, ctx2 ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS den2,
        |    CASE WHEN ctx2 IS NOT NULL THEN COUNT(*) OVER (PARTITION BY user_id, ctx2, event_type ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS num2
        |  FROM c
        |)
        |SELECT event_id, user_id,
        |  CASE WHEN den2 > 0 THEN CAST(num2 AS DOUBLE) / CAST(den2 AS DOUBLE)
        |       WHEN den1 > 0 THEN CAST(num1 AS DOUBLE) / CAST(den1 AS DOUBLE)
        |       ELSE 0.0::DOUBLE END AS prob,
        |  CAST(CASE WHEN den2 > 0 THEN num2 WHEN den1 > 0 THEN num1
        |       ELSE 0 END AS BIGINT) AS cnt,
        |  CAST(CASE WHEN den2 > 0 THEN 2 WHEN den1 > 0 THEN 1
        |       ELSE 0 END AS INT) AS depth
        |FROM w2""".stripMargin)(
      graft.streaming.StreamingQueries.streamForecastOnline),
    // s19: streaming Hamlet multi-query trend sharing (N patterns,
    // one shuffle of conditional aggs), sharing p10's oracle
    "s19_stream_multi_trend" -> QueryDef.of(
      """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
        | CASE WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'error' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_error,
        | CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
        | CASE WHEN COUNT(CASE WHEN event_type = 'click' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'click' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_click,
        | CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
        | CASE WHEN COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)) - 1, 0) AS BIGINT) END AS trends_purchase
        |FROM events
        |WHERE event_type IN ('error', 'click', 'purchase')
        |GROUP BY 1, 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamMultiTrend),
    // s16: streaming GRETA trend aggregation, sharing p6's oracle
    "s16_stream_trend" -> QueryDef.of(
      """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS event_count,
        | CASE WHEN COUNT(*) <= 53 THEN CAST(round(pow(2.0::DOUBLE, COUNT(*)) - 1, 0) AS BIGINT) END AS count_trends,
        | pow(2.0::DOUBLE, COUNT(*) - 1) * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_trends
        |FROM events WHERE event_type = 'error' GROUP BY 1, 2""".stripMargin)(
      graft.streaming.StreamingQueries.streamTrend),
    // s33: streaming REAL-MLP scoring (stateless mapPartitions with
    // the pre-trained net in the closure), sharing m4's oracle
    "s33_stream_mlp" -> QueryDef(
      graft.streaming.StreamingQueries.streamMlpScore,
      MlQueries.defs("m4_mlp_score").oracle),
    // s34: BPE tokenization at ingest — merge table pre-fit once per
    // corpus (memoized), native row-local encode on the stream;
    // emits t15's scalar projection and shares its full train+encode
    // hash oracle (stream≡batch also spec-pinned)
    "s34_stream_bpe" -> QueryDef(
      graft.streaming.StreamingQueries.streamBpeEncode,
      TextQueries.defs("t15_bpe_encode").oracle),
    // s43: NB quality classification at ingest — pre-fit model,
    // row-local native bucket walk, bit-identical to batch: shares
    // t21's oracle verbatim
    "s43_stream_quality" -> QueryDef(
      graft.streaming.StreamingQueries.streamNbQuality,
      TextQueries.defs("t21_quality_classifier").oracle),
    // s42: per-language tokenizer fertility maintained live — prefit
    // merges, row-local encode, one complete-mode agg (state = one
    // row per language); long sums commute so it shares t20's oracle
    "s42_stream_fertility" -> QueryDef(
      graft.streaming.StreamingQueries.streamFertility,
      TextQueries.defs("t20_tokenizer_fertility").oracle),
    // s15: streaming model scoring (stateless map), sharing m2's oracle
    "s15_stream_score" -> QueryDef.of(
      """SELECT event_id,
        | 0.5 + 0.5 * (-0.8::DOUBLE + value * 0.01::DOUBLE) /
        |   (1.0::DOUBLE + abs(-0.8::DOUBLE + value * 0.01::DOUBLE)) AS score
        |FROM events""".stripMargin)(
      graft.streaming.StreamingQueries.streamScore),
    // s12: streaming exact dedup — distinct (user, hour) click keys;
    // the key set is arrival-order independent, hence a plain
    // DISTINCT oracle
    "s12_stream_dedup" -> QueryDef.of(
      """SELECT DISTINCT user_id,
        | (epoch_us(ts) // 3600000000) * 3600 AS hr
        |FROM events WHERE event_type = 'click'""".stripMargin)(
      graft.streaming.StreamingQueries.streamDedup),
    // s13: stream-static broadcast enrich, sharing e1's oracle
    "s13_stream_enrich" -> QueryDef.of(
      """SELECT event_id, user_id,
        | COALESCE(c_name, 'unknown') AS cust_name,
        | COALESCE(c_mktsegment, 'unknown') AS segment,
        | CASE WHEN c_name IS NULL THEN 'fallback' ELSE 'ok' END AS enrich_status
        |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin)(
      graft.streaming.StreamingQueries.streamEnrich),
    "s5_stream_session" -> QueryDef.of(
      """WITH o AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
        |         WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 600000000 THEN 1
        |         ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |), sess AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, MIN(us) AS sess_start_us, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin)(
      graft.streaming.StreamingQueries.streamSession))

  /** Full registry: name → definition (Spark plan + optional oracle). */
  val all: Map[String, QueryDef] =
    CoreQueries.defs ++ WindowQueries.defs ++ PatternQueries.defs ++
      TextQueries.defs ++ VectorQueries.defs ++ MlQueries.defs ++
      VplQueries.defs ++ GuardrailQueries.defs ++ streamingDefs

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
