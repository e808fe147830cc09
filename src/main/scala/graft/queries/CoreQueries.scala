package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dsl.EventStream

/** Relational core: filter/project/join/merge/sort/limit/distinct/
  * enrich (SURVEY §2 #1–7, #14). TPC-H-ish tables exercise the same
  * operator surface the reference's stream pipeline offers on events.
  */
object CoreQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(14,2)")
  private def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(4,2)")

  val defs: Map[String, QueryDef] = Map(

    // --- #14 aggregate functions over grouped data (TPC-H Q1 shape) ---
    "q1_agg" -> QueryDef.of(
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        Tables(s, dir).lineitem
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
              .cast("double").as("sum_disc"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("n"))
    },

    // --- #1 filter + #2 projection with computed fields ---
    "q2_filter_project" -> QueryDef.of(
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.05 AND l_quantity < 24""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).lineitem)
          .where(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
            col("l_shipdate") < to_timestamp(lit("1996-01-01")) &&
            col("l_discount") >= 0.05 && col("l_quantity") < 24)
          .emit(
            "l_orderkey" -> col("l_orderkey"),
            "l_linenumber" -> col("l_linenumber"),
            "revenue" -> (dec(col("l_extendedprice")) *
              (lit(1) - dec4(col("l_discount")))).cast("double"))
    },

    // --- #3 multi-way join (dims broadcast) ---
    "q3_join" -> QueryDef.of(
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin) {
      (s, dir) =>
        val t = Tables(s, dir)
        // pre-shuffle the fact side on its join key: this IS the
        // shuffle the join needs (HashPartitioning is reused, no
        // second exchange), and it decouples parallelism from the
        // input file split — one row-group locally, and the same
        // co-partitioning a bucketed 100 TB table would give
        val li = t.lineitem.repartition(
          s.sparkContext.defaultParallelism, col("l_orderkey"))
        li.join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1) - dec4(col("l_discount"))))
              .cast("double").as("revenue"),
            count(lit(1)).as("n"))
    },

    // --- #5 order_by + limit (top-k → TakeOrderedAndProject, no full sort) ---
    "q4_topk" -> QueryDef.of(
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).orders)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .emit("o_orderkey" -> col("o_orderkey"),
            "o_totalprice" -> col("o_totalprice"))
    },

    // --- #6 distinct ---
    "q5_distinct" -> QueryDef.of(
      "SELECT DISTINCT event_type, user_id FROM events") {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .select("event_type" -> col("event_type"), "user_id" -> col("user_id"))
          .distinct().df
    },

    // --- #4 merge (stream union) then aggregate ---
    "q6_merge" -> QueryDef.of(
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT * FROM events WHERE event_type = 'purchase' AND value > 100
        |  UNION ALL
        |  SELECT * FROM events WHERE event_type = 'error'
        |) GROUP BY event_type""".stripMargin) {
      (s, dir) =>
        val ev = Tables(s, dir).events
        val purchases = EventStream.events(
          ev.filter(col("event_type") === "purchase" && col("value") > 100))
        val errors = EventStream.events(ev.filter(col("event_type") === "error"))
        purchases.merge(errors)
          .partitionBy("event_type")
          .aggregate(
            "n" -> count(lit(1)),
            "sum_value" -> sum(dec(col("value"))).cast("double"))
    },

    // --- #2 dynamic props access (JSON attrs on events) ---
    "q7_props" -> QueryDef.of(
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
        |FROM events WHERE event_type = 'purchase'""".stripMargin) {
      (s, dir) =>
        EventStream.events(Tables(s, dir).events)
          .where(col("event_type") === "purchase")
          .emit(
            "event_id" -> col("event_id"),
            "k" -> regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"))
    },

    // --- #1 membership (`in` over a derived set → broadcast semi-join) ---
    "q8_semijoin" -> QueryDef.of(
      """SELECT event_id, user_id FROM events
        |WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""".stripMargin) {
      (s, dir) =>
        val t = Tables(s, dir)
        t.events.join(
          broadcast(t.customer.filter(col("c_acctbal") > 5000).select("c_custkey")),
          col("user_id") === col("c_custkey"), "left_semi")
          .select("event_id", "user_id")
    },

    // --- keep-latest per key (distinct-on: last state per user) ---
    "q9_latest" -> QueryDef.of(
      """SELECT user_id,
        | arg_max(event_id, event_id) AS last_event_id,
        | arg_max(event_type, event_id) AS last_type,
        | arg_max(value, event_id) AS last_value
        |FROM events GROUP BY user_id""".stripMargin) {
      (s, dir) =>
        Tables(s, dir).events
          .groupBy("user_id")
          .agg(
            max_by(col("event_id"), col("event_id")).as("last_event_id"),
            max_by(col("event_type"), col("event_id")).as("last_type"),
            max_by(col("value"), col("event_id")).as("last_value"))
    },

    // --- scalar builtin surface (strings/math/timestamps, builtins.md) ---
    "b1_builtins" -> QueryDef.of(
      """SELECT event_id,
        | length(event_type) AS type_len,
        | upper(event_type) AS type_upper,
        | contains(event_type, 'ur') AS has_ur,
        | abs(value - 100.0) AS dist,
        | round(sqrt(value), 4) AS root,
        | CAST(floor(value) AS BIGINT) AS flr,
        | year(ts) AS y, month(ts) AS m, hour(ts) AS h,
        | coalesce(NULL, event_type) AS coal
        |FROM events""".stripMargin) {
      (s, dir) => {
        import graft.functions.VplBuiltins._
        Tables(s, dir).events.select(
          col("event_id"),
          len(col("event_type")).cast("long").as("type_len"),
          upperF(col("event_type")).as("type_upper"),
          containsF(col("event_type"), "ur").as("has_ur"),
          absF(col("value") - 100.0).as("dist"),
          roundF(sqrtF(col("value")), 4).as("root"),
          floorF(col("value")).cast("long").as("flr"),
          yearF(col("ts")).cast("long").as("y"),
          monthF(col("ts")).cast("long").as("m"),
          hourF(col("ts")).cast("long").as("h"),
          coalesceF(lit(null).cast("string"), col("event_type")).as("coal"))
      }
    },

    // --- #7 enrichment: broadcast lookup join + fallback ---
    "e1_enrich" -> QueryDef.of(
      """SELECT event_id, user_id,
        | COALESCE(c_name, 'unknown') AS cust_name,
        | COALESCE(c_mktsegment, 'unknown') AS segment,
        | CASE WHEN c_name IS NULL THEN 'fallback' ELSE 'ok' END AS enrich_status
        |FROM events LEFT JOIN customer ON user_id = c_custkey""".stripMargin) {
      (s, dir) =>
        val t = Tables(s, dir)
        EventStream.events(t.events)
          .enrich(t.customer.select("c_custkey", "c_name", "c_mktsegment"),
            col("user_id"), "c_custkey",
            fields = Seq("c_name", "c_mktsegment"),
            fallback = Map("c_name" -> lit("unknown"),
              "c_mktsegment" -> lit("unknown")))
          .emit(
            "event_id" -> col("event_id"),
            "user_id" -> col("user_id"),
            "cust_name" -> col("c_name"),
            "segment" -> col("c_mktsegment"),
            "enrich_status" -> col("enrich_status"))
    },

    // --- #5b hierarchical aggregation (ROLLUP / grouping sets): the
    // warehouse-report shape — detail, subtotal and grand-total rows
    // from ONE scan + ONE Expand-based aggregation (Catalyst plans
    // rollup as an Expand of the grouping sets feeding a single
    // partial agg — no per-level rescans). grouping_id disambiguates
    // genuine NULL keys from rolled-up rows on both engines ---
    "q10_rollup" -> QueryDef.of(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) {
      (s, dir) =>
        Tables(s, dir).lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("sum_qty"))
          .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
            col("n"), col("sum_qty"))
    },

    // --- #7d as-of (temporal) enrichment: every event annotated with
    // the LATEST preceding signup state of its user — the
    // slowly-changing-dimension join (enrichment/ against a
    // time-versioned dimension). Plan: NO join at all — facts and
    // dimension updates ride ONE shuffle on the entity key and a
    // running last(ignoreNulls) window carries the state forward
    // (the union-window as-of shape); the naive formulation is a
    // time-range join + per-fact argmax, a second corpus-sized
    // shuffle plus a dedup this plan never pays. Events before any
    // signup surface with NULL state (the fallback contract) ---
    "e2_asof_enrich" -> QueryDef.of(
      """WITH t AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
        |    CASE WHEN event_type = 'signup' THEN event_id END AS dim_id,
        |    CASE WHEN event_type = 'signup' THEN value END AS dim_value,
        |    CASE WHEN event_type = 'signup' THEN epoch_us(ts) END AS dim_us
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    last_value(dim_id IGNORE NULLS) OVER win AS asof_signup_id,
        |    last_value(dim_value IGNORE NULLS) OVER win AS asof_value,
        |    last_value(dim_us IGNORE NULLS) OVER win AS asof_us
        |  FROM t
        |  WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, asof_signup_id, asof_value,
        |  us - asof_us AS asof_gap_us
        |FROM w WHERE event_type != 'signup'""".stripMargin) {
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables(s, dir).events
        val isDim = col("event_type") === "signup"
        val t = ev.select(
          col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          when(isDim, col("event_id")).as("dim_id"),
          when(isDim, col("value")).as("dim_value"),
          when(isDim, unix_micros(col("ts"))).as("dim_us"))
        val win = Window.partitionBy("user_id")
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.select(col("event_id"), col("user_id"), col("event_type"),
          col("us"),
          last(col("dim_id"), ignoreNulls = true).over(win).as("asof_signup_id"),
          last(col("dim_value"), ignoreNulls = true).over(win).as("asof_value"),
          last(col("dim_us"), ignoreNulls = true).over(win).as("asof_us"))
          .where(col("event_type") =!= "signup")
          .select(col("event_id"), col("user_id"), col("asof_signup_id"),
            col("asof_value"),
            (col("us") - col("asof_us")).as("asof_gap_us"))
      }
    })
}
