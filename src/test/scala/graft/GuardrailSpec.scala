package graft

import org.apache.spark.sql.functions._

import graft.guard.Guardrails

/** Semantics of the operational guardrails (SURVEY §2 #50–52) on
  * crafted inputs — the oracle gate checks them against real data;
  * these pin the state-machine edges directly.
  */
class GuardrailSpec extends SparkSpec {

  test("deadLetterSplit partitions rows and names the FIRST failed rule") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, "ok"),
      (2L, -1.0, "ok"),      // fails rule A
      (3L, -1.0, "bad"),     // fails A and B — A must name it
      (4L, 10.0, "bad")      // fails rule B
    ).toDF("id", "v", "tag")
    val (clean, dlq) = Guardrails.deadLetterSplit(df, Seq(
      "neg_value" -> (col("v") >= 0.0),
      "bad_tag" -> (col("tag") === "ok")))
    assert(clean.select("id").as[Long].collect().toSet == Set(1L))
    val errs = dlq.select("id", "error").as[(Long, String)].collect().toMap
    assert(errs == Map(2L -> "neg_value", 3L -> "neg_value", 4L -> "bad_tag"))
  }

  test("rateLimit admits the first N per key-window by order column") {
    import spark.implicits._
    // 4 events for key 1 in one hour (cap 2), 1 in the next hour,
    // 1 for key 2 — order within the window is the order column,
    // regardless of row order
    val base = 1704067200L * 1000000L // 2024-01-01T00:00Z µs
    val df = Seq(
      (14L, 1L, base + 300L * 1000000),
      (11L, 1L, base + 60L * 1000000),
      (12L, 1L, base + 120L * 1000000),
      (13L, 1L, base + 180L * 1000000),
      (21L, 1L, base + 3900L * 1000000),
      (31L, 2L, base + 60L * 1000000)
    ).toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Guardrails.rateLimit(df, "user_id", "ts", "event_id", 2)
      .select("event_id", "admitted").as[(Long, Boolean)].collect().toMap
    assert(got == Map(11L -> true, 12L -> true, 13L -> false,
      14L -> false, 21L -> true, 31L -> true))
  }

  test("circuitBreakerReplay walks closed -> open -> rejected -> probe edges") {
    import spark.implicits._
    val base = 1704067200L * 1000000L
    def ev(id: Long, offsetSec: Long, ok: Boolean) =
      (id, "sink", base + offsetSec * 1000000L, ok)
    // threshold 2, timeout 1h:
    //  e1 ok (sent, closed)        e2 fail (sent, closed, consec 1)
    //  e3 fail (sent, OPEN — trip) e4 +10m (rejected, open)
    //  e5 +2h fail probe (probe, re-OPEN from e5)
    //  e6 +30m after e5 (rejected — inside the re-opened window)
    //  e7 +2h after e5, ok probe (probe, closed)
    //  e8 ok (sent, closed)
    val df = Seq(
      ev(1, 0, ok = true), ev(2, 60, ok = false), ev(3, 120, ok = false),
      ev(4, 720, ok = true), ev(5, 120 + 7200, ok = false),
      ev(6, 120 + 7200 + 1800, ok = true), ev(7, 120 + 7200 + 7200, ok = true),
      ev(8, 120 + 7200 + 7300, ok = true)
    ).toDF("event_id", "connector", "us", "ok")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = Guardrails.circuitBreakerReplay(df, "connector", "event_id",
        "ts", col("ok"), threshold = 2, timeout = "1 hour")
      .select("event_id", "decision", "state_after")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "sent", "closed"), (2L, "sent", "closed"), (3L, "sent", "open"),
      (4L, "rejected", "open"), (5L, "probe", "open"),
      (6L, "rejected", "open"), (7L, "probe", "closed"),
      (8L, "sent", "closed")))
  }

  test("g1/g2/g3 run against the staged tables with nonempty output") {
    for (name <- Seq("g1_dead_letter", "g2_rate_limit", "g3_circuit_breaker"))
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
  }
}
