package graft

import org.apache.spark.sql.functions._

/** Structured Streaming twins must agree with their batch plans. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg equals batch tumbling agg") {
    val cols = Seq("event_type", "win_start", "n", "sum_value")
    val streamed = SparkEntry.all("s1_stream_tumbling").build(spark, sf)
      .select(cols.head, cols.tail: _*)
    val batch = SparkEntry.all("w1_tumbling").build(spark, sf)
      .select(cols.head, cols.tail: _*)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("windows are epoch-aligned hours") {
    val rows = SparkEntry.all("w1_tumbling").build(spark, sf)
      .select("win_start").distinct().collect()
    rows.foreach(r => assert(r.getLong(0) % 3600 == 0))
  }

  test("session windows respect the gap") {
    // no two sessions of the same user may be closer than the gap
    val s = SparkEntry.all("w3_session").build(spark, sf)
      .select(col("user_id"), col("sess_start_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("sess_start_us")
    val gaps = s.withColumn("prev", lag("sess_start_us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("sess_start_us") - col("prev")).as("d"))
      .collect()
    gaps.foreach(r => assert(r.getLong(0) >= 600000000L))
  }
}
