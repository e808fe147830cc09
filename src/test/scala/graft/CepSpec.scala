package graft

import org.apache.spark.sql.functions._
import graft.cep._

/** Cross-validation of the pattern-matching paths: the streaming NFA,
  * the batch join compiler, and the closed-form trend aggregation
  * must agree with each other / with brute-force definitions.
  */
class CepSpec extends SparkSpec {

  private def events = Tables(spark, sf).events

  test("streaming NFA match count == batch join compiler count") {
    val batch = SparkEntry.all("p1_seq2").build(spark, sf).count()
    val stream = SparkEntry.all("s2_stream_pattern").build(spark, sf).count()
    assert(batch == stream)
  }

  test("earliest-match is a subset of all-matches with min policy") {
    val all = SparkEntry.all("p1_seq2").build(spark, sf)
    val earliest = Pattern.earliestMatch(events,
      Step("a", col("event_type") === "signup"),
      Step("b", col("event_type") === "purchase"),
      withinSec = 1800, partitionKeys = Seq("user_id"), carryB = Seq("value"))
      .select(col("event_id").as("a_id"), col("__next_b.o").as("b_id"))
    // for each a_id, earliest-match picks exactly min(b_id) of all-matches
    val expected = all.groupBy("a_id").agg(min("b_id").as("b_id"))
    assert(earliest.except(expected).count() == 0)
    assert(expected.except(earliest).count() == 0)
  }

  test("trend aggregation closed form: 2^n - 1 trends, n capped") {
    val out = TrendAggregate.kleene(events,
      col("event_type") === "error", col("value"), "1 hour", Seq("user_id"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("event_count")
      val trends = r.getAs[Long]("count_trends")
      assert(trends == (1L << n) - 1, s"n=$n trends=$trends")
    }
  }

  test("trend count_trends exact at n=53, NULL at n=54 (overflow guard)") {
    import spark.implicits._
    val df = ((1 to 53).map(i => ("u53", i)) ++ (1 to 54).map(i => ("u54", i)))
      .toDF("user_id", "i")
      .select(col("user_id"),
        timestamp_micros(lit(1700000000000000L) + col("i") * 1000000L).as("ts"),
        lit(1.0).as("value"))
    val out = TrendAggregate.kleene(df, lit(true), col("value"), "1 hour",
      Seq("user_id")).collect().map(r => r.getString(0) -> r).toMap
    assert(out("u53").getAs[Long]("count_trends") == (1L << 53) - 1)
    assert(out("u54").isNullAt(out("u54").fieldIndex("count_trends")))
    // count_events still carries the true n either side of the cap
    assert(out("u54").getAs[Long]("event_count") == 54L)
  }

  test("avg/min/max_trends closed forms (hand case)") {
    import spark.implicits._
    // values 1,2,4 in one window: count_trends = 7, sum_trends =
    // 2^2 * 7 = 28, avg_trends = 28/7 = 4, min/max = field extrema
    val df = Seq(1.0, 2.0, 4.0).zipWithIndex.map { case (v, i) => ("u", i, v) }
      .toDF("user_id", "i", "value")
      .select(col("user_id"),
        timestamp_micros(lit(1700000000000000L) + col("i") * 1000000L).as("ts"),
        col("value"))
    val r = TrendAggregate.kleene(df, lit(true), col("value"), "1 hour",
      Seq("user_id")).collect().head
    assert(r.getAs[Long]("count_trends") == 7L)
    assert(r.getAs[Double]("sum_trends") == 28.0)
    assert(r.getAs[Double]("avg_trends") == 4.0)
    assert(r.getAs[Double]("min_trends") == 1.0)
    assert(r.getAs[Double]("max_trends") == 4.0)
  }

  test("negation + sequence partition the anchors") {
    // purchases followed by an error within 15m + purchases not = all purchases
    val negated = SparkEntry.all("p3_negation").build(spark, sf).count()
    val violating = events.as("p").filter(col("p.event_type") === "purchase")
      .join(events.as("e"),
        col("p.user_id") === col("e.user_id") &&
          col("e.event_type") === "error" &&
          col("e.event_id") > col("p.event_id") &&
          (unix_micros(col("e.ts")) - unix_micros(col("p.ts"))) <= 900000000L,
        "left_semi")
      .count()
    val total = events.filter(col("event_type") === "purchase").count()
    assert(negated + violating == total)
  }

  test("PST depth-1 scores equal order-1 transition model") {
    val t1 = Forecast.transitions(events)
      .select(col("cur").as("context"), col("nxt"), col("prob"))
    val pst1 = Forecast.pstScores(events, maxDepth = 2)
      .filter(col("depth") === 1)
      .select(col("context"), col("nxt"), col("prob"))
    assert(pst1.except(t1).count() == 0)
    assert(t1.except(pst1).count() == 0)
  }

  test("kleeneIncreasing counts predicate-constrained trends (hand case)") {
    import spark.implicits._
    // values [1,3,2,4] in event_id order, one user, one window:
    // increasing subsequences = 4 singles + {13,12,14,34,24} pairs
    // + {134,124} triples = 11. An unconstrained 2^4−1 would be 15.
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    val df = Seq(
      (1L, 7L, 1.0, ts(100)), (2L, 7L, 3.0, ts(200)),
      (3L, 7L, 2.0, ts(300)), (4L, 7L, 4.0, ts(400)))
      .toDF("event_id", "user_id", "value", "ts")
    val out = TrendAggregate.kleeneIncreasing(df, lit(true), "value",
      "1 day", Seq("user_id")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("event_count") == 4L)
    assert(out.head.getAs[Long]("count_trends") == 11L)
    // sums per trend: singles 10 + pairs 25 + triples 15 = 50
    assert(out.head.getAs[Double]("sum_trends") == 50.0)
  }

  test("kleeneIncreasing equals 2^n−1 when values are already increasing") {
    import spark.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    val df = (1 to 8).map(i =>
      (i.toLong, 1L, i.toDouble, ts(i * 60L)))
      .toDF("event_id", "user_id", "value", "ts")
    val out = TrendAggregate.kleeneIncreasing(df, lit(true), "value",
      "1 day", Seq("user_id")).collect()
    assert(out.head.getAs[Long]("count_trends") == 255L)
  }

  test("kleene-star keeps anchor pairs with empty B-runs, kleene-plus drops them") {
    val star = SparkEntry.all("p12_kleene_star").build(spark, sf)
    val plus = SparkEntry.all("p7_kleene").build(spark, sf)
    val empty = star.filter(col("n_b") === 0)
    assert(empty.count() > 0, "expected some signup->purchase pairs with no errors between")
    assert(empty.filter(col("first_b").isNotNull || col("sum_b").isNotNull).count() == 0)
    // star restricted to non-empty runs == plus
    val nonEmpty = star.filter(col("n_b") > 0)
    assert(nonEmpty.count() == plus.count())
    assert(nonEmpty.except(plus).count() == 0)
  }

  test("hawkesIntensity matches the hand-run recursion and decays between bursts") {
    import spark.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    val (mu, alpha, beta) = (0.1, 0.5, 0.01)
    val times = Seq(0L, 10L, 20L, 1000L) // burst then a long gap
    val df = times.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, 1L, "e", 0.0, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val got = Forecast.hawkesIntensity(df, mu, alpha, beta)
      .orderBy("event_id").collect().map(_.getAs[Double]("intensity"))
    // hand recursion: i1 = mu+alpha; i_k = mu + (i_{k-1}-mu+alpha)*exp(-beta*dt)
    var prev = mu + alpha
    val expected = Seq(prev) ++ times.sliding(2).map { case Seq(t0, t1) =>
      prev = mu + (prev - mu + alpha) * math.exp(-beta * (t1 - t0))
      prev
    }.toSeq
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"got $g want $e") }
    // burst raises intensity; the long gap decays it back toward mu
    assert(got(2) > got(1) && got(1) > got(0))
    assert(got(3) < got(2) && got(3) >= mu)
    // boost factor is clamped to [1, 5]
    val boosts = Forecast.hawkesIntensity(df, mu, alpha, beta)
      .collect().map(_.getAs[Double]("boost_factor"))
    assert(boosts.forall(b => b >= 1.0 && b <= 5.0))
  }

  test("adaptive Hawkes: burst raises boost, params adapt to the observed rate") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // reference test_burst_increases_boost: 20 events 1ms apart
    val burst = (0 until 20).map(i =>
      ((i + 1).toLong, 1L, "e", 0.0, ts(i.toLong)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val rows = Forecast.hawkesIntensityAdaptive(burst)
      .orderBy("event_id").collect()
    assert(rows.last.getAs[Double]("boost_factor") > 1.0,
      "a burst must raise the boost above baseline")
    rows.foreach { r =>
      val b = r.getAs[Double]("boost_factor")
      assert(b >= 1.0 && b <= 5.0)
      assert(r.getAs[Double]("intensity") > 0.0)
    }
    // after estimation kicks in (>=10 events), mu ≈ 1/mean_delta:
    // with 0.001s gaps the intensity floor (mu) must exceed the
    // initial baseline of 1 ev/s by orders of magnitude
    assert(rows.last.getAs[Double]("intensity") > 100.0,
      s"adapted intensity ${rows.last.getAs[Double]("intensity")} should track the ~1000 ev/s regime")
  }

  test("adaptive Hawkes equals fixed-parameter recursion before estimation starts") {
    import spark.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    // 8 events (< MIN_EVENTS_FOR_ESTIMATION): the EMA trackers run but
    // parameters stay at their initial values → identical intensities
    val df = (1 to 8).map(i => (i.toLong, 1L, "e", 0.0, ts(i * 3L)))
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val fixed = Forecast.hawkesIntensity(df, mu = 1.0, alpha = 0.5, beta = 1.0)
      .orderBy("event_id").collect().map(_.getAs[Double]("intensity"))
    val adaptive = Forecast.hawkesIntensityAdaptive(df)
      .orderBy("event_id").collect().map(_.getAs[Double]("intensity"))
    fixed.zip(adaptive).foreach { case (f, a) =>
      assert(math.abs(f - a) < 1e-12, s"fixed=$f adaptive=$a") }
  }

  test("conformal intervals contain the point forecast and have coverage") {
    val out = Forecast.conformalIntervals(events, "purchase")
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getAs[Double]("p"), r.getAs[Double]("lo"),
        r.getAs[Double]("hi"))
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"p=$p outside [$lo,$hi]")
      assert(lo >= 0.0 && hi <= 1.0)
    }
    // with a 90%-quantile calibrator, most intervals are non-degenerate
    assert(rows.count(r =>
      r.getAs[Double]("hi") > r.getAs[Double]("lo")) > rows.length / 2)
  }

  test("salted sequence join fans a hot key across tasks with identical results") {
    import spark.implicits._
    def ts(sec: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(sec))
    // one user holds 50% of all events — the canonical hot key
    val hot = (1 to 500).map(i => (i.toLong, 1L,
      if (i % 2 == 0) "signup" else "purchase", 1.0, ts(i * 10L)))
    val rest = (1 to 500).map(i => (500L + i, 100L + i % 50,
      if (i % 2 == 0) "signup" else "purchase", 1.0, ts(i * 10L)))
    val df = (hot ++ rest)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .repartition(8)
    val pat = Seq(
      Step("a", col("event_type") === "signup"),
      Step("b", col("event_type") === "purchase"))
    val plain = SeqPattern(pat, withinSec = 3600, Seq("user_id"))
      .compile(df).select("a_event_id", "b_event_id")
    val salted = SeqPattern(pat, withinSec = 3600, Seq("user_id"),
      saltBuckets = Some(8)).compile(df)
    // identity: salting must not change the match set
    val saltedIds = salted.select("a_event_id", "b_event_id")
    assert(saltedIds.count() == plain.count())
    assert(saltedIds.except(plain).count() == 0)
    assert(plain.except(saltedIds).count() == 0)
    // fan-out: the hot user's matches are produced by >1 join task
    val parts = salted.filter(col("a_user_id") === 1L)
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
      .distinct().count()
    assert(parts > 1, s"hot key still confined to $parts partition(s)")
  }

  test("forecastPattern emits calibrated probabilities in [0,1]") {
    val out = Forecast.forecastPattern(spark, events, "purchase", maxDepth = 2)
    val probs = out.select("forecast_probability").collect().map(_.getDouble(0))
    assert(probs.nonEmpty)
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    assert(probs.exists(_ > 0.0), "model should score some contexts > 0")
  }
}
