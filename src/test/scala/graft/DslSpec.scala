package graft

import org.apache.spark.sql.functions._
import graft.dsl.EventStream

/** DSL utilities: salted joins and the builtin function mapping. */
class DslSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under skew") {
    val t = Tables(spark, sf)
    val ev = t.events
    val cust = t.customer
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .select(col("event_id"), col("c_custkey"))
    val salted = EventStream.saltedJoin(
      ev, cust, "user_id", "c_custkey", buckets = 8)
      .select(col("event_id"), col("c_custkey"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("salted left join keeps unmatched left rows exactly once") {
    val t = Tables(spark, sf)
    val salted = EventStream.saltedJoin(
      t.events, t.customer.filter(col("c_custkey") < 5),
      "user_id", "c_custkey", buckets = 4, how = "left")
    assert(salted.count() == t.events.count())
  }

  test("builtins: deterministic scalar surface") {
    import graft.functions.VplBuiltins._
    val r = spark.range(1).select(
      len(lit("hello")).as("l"),
      upperF(lit("ab")).as("u"),
      containsF(lit("purchase"), "ur").as("c"),
      replaceF(lit("a.b.c"), ".", "-").as("rep"),
      regexMatch(lit("abc123"), "^[a-z]+[0-9]+$").as("rm"),
      absF(lit(-3.5)).as("a"),
      powF(lit(2.0), lit(10.0)).as("p"),
      durationBetweenUs(
        to_timestamp(lit("2024-01-01 00:00:00")),
        to_timestamp(lit("2024-01-01 00:00:01"))).as("d")).head()
    assert(r.getAs[Int]("l") == 5)
    assert(r.getAs[String]("u") == "AB")
    assert(r.getAs[Boolean]("c"))
    assert(r.getAs[String]("rep") == "a-b-c")
    assert(r.getAs[Boolean]("rm"))
    assert(r.getAs[Double]("a") == 3.5)
    assert(r.getAs[Double]("p") == 1024.0)
    assert(r.getAs[Long]("d") == 1000000L)
  }

  test("DSL guardrails: deadLetter forks, rateLimit marks admissions") {
    import org.apache.spark.sql.functions._
    val ev = EventStream.events(Tables(spark, sf).events)
    val (clean, dlq) = ev.deadLetter(
      "neg_value" -> (col("value") >= 0.0),
      "huge_value" -> (col("value") <= 400.0))
    assert(clean.df.count() + dlq.count() == Tables(spark, sf).events.count())
    assert(!dlq.columns.isEmpty && dlq.columns.contains("error"))
    val limited = ev.partitionBy("user_id").rateLimit(2).df
    val over = limited.filter(!col("admitted"))
      .groupBy("user_id", "win_start").count()
    // every (key, hour) admits at most 2: total - rejected == admitted
    val admittedPerWin = limited.filter(col("admitted"))
      .groupBy("user_id", "win_start").count()
      .agg(max("count")).head.getLong(0)
    assert(admittedPerWin <= 2L)
    assert(limited.count() == ev.df.count())
    over.count() // materializes without error
  }

  test("e2 as-of union-window plan ≡ naive time-range join + argmax") {
    // cross-path evidence: the single-shuffle union-window as-of
    // enrichment must return exactly what the textbook formulation
    // (join every fact to ALL preceding signups, keep the latest)
    // computes — including NULL state for pre-first-signup facts
    import org.apache.spark.sql.functions._
    val fast = SparkEntry.all("e2_asof_enrich").build(spark, sf)
    val ev = Tables(spark, sf).events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val facts = ev.where(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id").as("f_user"), col("us"))
    val dims = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("d_user"), col("event_id").as("d_id"),
        col("us").as("d_us"), col("value").as("d_value"))
    val naive = facts
      .join(dims, col("f_user") === col("d_user") &&
        // as-of order = (us, event_id), matching the window sort
        (col("d_us") < col("us") ||
          (col("d_us") === col("us") && col("d_id") < col("event_id"))),
        "left")
      .groupBy(col("event_id"), col("f_user").as("user_id"), col("us"))
      .agg(max_by(struct(col("d_id"), col("d_value"), col("d_us")),
        struct(col("d_us"), col("d_id"))).as("m"))
      .select(col("event_id"), col("user_id"),
        col("m.d_id").as("asof_signup_id"),
        col("m.d_value").as("asof_value"),
        (col("us") - col("m.d_us")).as("asof_gap_us"))
    assert(fast.count() == naive.count())
    assert(fast.except(naive).isEmpty && naive.except(fast).isEmpty)
  }
}
