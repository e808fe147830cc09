package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dsl._

/** Windowed aggregation surface (SURVEY §2 #8–20): tumbling, sliding,
  * session, count, sliding-count, partitioned windows, and the
  * aggregation function set (stddev/count_distinct/percentile/ema/
  * first/last/collect).
  */
object WindowQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(14,2)")

  val defs: Map[String, QueryDef] = Map(

    // --- #8 tumbling event-time window (epoch-aligned, 1h) ---
    "w1_tumbling" -> QueryDef.of(
      """SELECT event_type,
        | (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("event_type")
          .window(Tumbling("1 hour"))
          .aggregate(
            "n" -> count(lit(1)),
            "sum_value" -> sum(dec(col("value"))).cast("double"))
    },

    // --- #9 sliding window (1h size, 30m slide → 2 windows/event) ---
    "w2_sliding" -> QueryDef.of(
      """SELECT event_type,
        | ((epoch_us(ts) // 1800000000) - k) * 1800 AS win_start,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) offs
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("event_type")
          .window(Sliding("1 hour", "30 minutes"))
          .aggregate(
            "n" -> count(lit(1)),
            "sum_value" -> sum(dec(col("value"))).cast("double"))
    },

    // --- #10 session window (10m gap) per user; µs-exact start ---
    "w3_session" -> QueryDef.of(
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
        |FROM sess GROUP BY user_id, sid""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("user_id")
          .window(SessionWin("10 minutes"))
          .aggregate(
            "n" -> count(lit(1)),
            "sum_value" -> sum(dec(col("value"))).cast("double"))
    },

    // --- #11 count window: batches of 10 events per user (full only) ---
    "w4_count_window" -> QueryDef.of(
      """WITH r AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events)
        |SELECT user_id, CAST((rn - 1) // 10 AS BIGINT) AS win_id,
        |  MIN(event_id) AS first_id, MAX(event_id) AS last_id,
        |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM r GROUP BY user_id, (rn - 1) // 10 HAVING COUNT(*) = 10""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("user_id")
          .window(CountWin(10))
          .aggregate(
            "first_id" -> min(col("event_id")),
            "last_id" -> max(col("event_id")),
            "sum_value" -> sum(dec(col("value"))).cast("double"))
    },

    // --- #12 sliding count window: last 20 events, every 5, per user ---
    "w5_sliding_count" -> QueryDef.of(
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER w AS rn,
        |    SUM(CAST(value AS DECIMAL(14,2))) OVER
        |      (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS sv,
        |    COUNT(*) OVER
        |      (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id, CAST(sv AS DOUBLE) AS sum_value, n
        |FROM r WHERE rn % 5 = 0 AND rn >= 20""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("user_id")
          .window(SlidingCountWin(20, 5))
          .aggregate(
            "sum_value_dec" -> sum(dec(col("value"))),
            "n" -> count(lit(1)))
          .withColumn("sum_value", col("sum_value_dec").cast("double"))
          .drop("sum_value_dec")
    },

    // --- #13 partitioned tumbling + #15 first/last by event order ---
    "w6_partitioned" -> QueryDef.of(
      """SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        | COUNT(*) AS n,
        | arg_min(value, event_id) AS first_val,
        | arg_max(value, event_id) AS last_val
        |FROM events GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .partitionBy("user_id")
          .window(Tumbling("1 hour"))
          .aggregate(
            "n" -> count(lit(1)),
            "first_val" -> min_by(col("value"), col("event_id")),
            "last_val" -> max_by(col("value"), col("event_id")))
    },

    // --- analytic window functions (row_number/rank/lag/lead —
    // builtins.md "Planned Window Functions", all native here) ---
    "w7_analytics" -> QueryDef.of(
      """SELECT event_id, user_id,
        | row_number() OVER w AS rn,
        | rank() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rk,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | value - lag(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin) {
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("value", "event_id")
        Tables(s, dir).events.select(
          col("event_id"), col("user_id"),
          row_number().over(w).cast("long").as("rn"),
          rank().over(wv).cast("long").as("rk"),
          lag("value", 1).over(w).as("prev_value"),
          lead("value", 1).over(w).as("next_value"),
          (col("value") - lag("value", 1).over(w)).as("delta"))
      }
    },

    // --- #16/#17/#18 stddev, count_distinct, percentiles (exact) ---
    "a1_stats" -> QueryDef.of(
      """WITH s AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    COUNT(DISTINCT user_id) AS nd_users,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(value AS DECIMAL(14,2)) * CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sxx,
        |    round(quantile_cont(value, 0.5), 6) AS median_value,
        |    round(quantile_cont(value, 0.9), 6) AS p90_value
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, nd_users,
        |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_value,
        |  median_value, p90_value
        |FROM s""".stripMargin) {
      (s, dir) =>
        Tables(s, dir).events
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("nd_users"),
            sum(dec(col("value"))).cast("double").as("sx"),
            sum(dec(col("value")) * dec(col("value"))).cast("double").as("sxx"),
            round(expr("percentile(value, 0.5D)"), 6).as("median_value"),
            round(expr("percentile(value, 0.9D)"), 6).as("p90_value"))
          .select(col("event_type"), col("n"), col("nd_users"),
            round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
              (col("n") - 1)), 6).as("stddev_value"),
            col("median_value"), col("p90_value"))
    },

    // --- anomaly scoring: z-score vs trailing window (per key), the
    // alarm-verification shape — flag |z| > 3 over the last 20 events
    // (exact decimal moments → deterministic flags) ---
    "w8_anomaly" -> QueryDef.of(
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
        |FROM r WHERE n >= 5""".stripMargin) {
      (s, dir) => {
        val f = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id").rowsBetween(-20, -1)
        val d = Tables(s, dir).events.select(
          col("user_id"), col("event_id"), col("value"),
          count(lit(1)).over(f).as("n"),
          sum(dec(col("value"))).over(f).cast("double").as("sx"),
          sum(dec(col("value")) * dec(col("value"))).over(f)
            .cast("double").as("sxx"))
        val z = (col("value") - col("sx") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
        d.filter(col("n") >= 5)
          .select(col("user_id"), col("event_id"), col("value"),
            round(z, 6).as("z"), (abs(z) > 3.0).as("is_anomaly"))
      }
    },

    // --- heavy hitters: top-2 event types per hour by count ---
    "a5_heavy_hitters" -> QueryDef.of(
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start,
        |    event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT win_start, event_type, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY win_start
        |    ORDER BY n DESC, event_type) AS rk FROM c)
        |WHERE rk <= 2""".stripMargin) {
      (s, dir) => {
        val counts = Tables(s, dir).events
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("win_start", col("window.start").cast("long"))
          .drop("window")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("win_start").orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 2).drop("rk")
      }
    },

    // --- #19 ema(value, 10): explicit in-order fold, bit-deterministic ---
    "a2_ema" -> QueryDef.of(
      """SELECT user_id,
        | list_reduce(
        |   list_transform(list(struct_pack(eid := event_id, v := value) ORDER BY event_id), r -> r.v),
        |   (acc, x) -> (2.0::DOUBLE / 11.0::DOUBLE) * x + (1.0::DOUBLE - 2.0::DOUBLE / 11.0::DOUBLE) * acc
        | ) AS ema10,
        | COUNT(*) AS n
        |FROM events GROUP BY user_id""".stripMargin) {
      (s, dir) => {
        // native codegen'd O(n) fold (EmaFold) — same a*x + b*acc
        // step constants as the oracle's list_reduce; replaces the
        // interpreted per-element `aggregate` lambda
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val lst = sort_array(collect_list(struct(col("event_id"), col("value"))))
        Tables(s, dir).events
          .groupBy("user_id")
          .agg(
            ColumnBridge.column(graft.functions.EmaFold(
              ColumnBridge.expression(lst),
              2.0 / 11.0, 1.0 - 2.0 / 11.0)).as("ema10"),
            count(lit(1)).as("n"))
          .select(col("user_id"), col("ema10"), col("n"))
      }
    },

    // --- sketch aggregates: the 100 TB path for count_distinct /
    // percentile (HLL / KLL-style; exact twins are in a1_stats; sketch
    // internals differ per engine → rows-only, spec-bounded error) ---
    "a4_approx" -> QueryDef.rowsOnly {
      (s, dir) =>
        Tables(s, dir).events
          .groupBy("event_type")
          .agg(
            approx_count_distinct(col("user_id")).as("approx_users"),
            expr("approx_percentile(value, 0.5D)").as("approx_median"),
            expr("approx_percentile(value, 0.99D)").as("approx_p99"))
    },

    // --- #20 collect() — ordered value list (string-normalized) ---
    "a3_collect" -> QueryDef.of(
      """SELECT user_id,
        | array_to_string(
        |   list_transform(list(struct_pack(eid := event_id, v := value) ORDER BY event_id),
        |     r -> CAST(CAST(r.v AS DECIMAL(14,2)) AS VARCHAR)), ',') AS vals,
        | COUNT(*) AS n
        |FROM events GROUP BY user_id""".stripMargin) {
      (s, dir) => {
        val lst = array_sort(collect_list(struct(col("event_id"), col("value"))))
        Tables(s, dir).events
          .groupBy("user_id")
          .agg(
            array_join(transform(lst,
              r => r.getField("value").cast("decimal(14,2)").cast("string")), ",")
              .as("vals"),
            count(lit(1)).as("n"))
      }
    })
}
