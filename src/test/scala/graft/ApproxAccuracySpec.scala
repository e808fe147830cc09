package graft

import org.apache.spark.sql.functions._
import graft.ann.Knn

/** Quantitative accuracy bounds for the two by-design rows-only
  * queries (a4 sketch aggregates, v4/v6 approximate ANN): the oracle
  * gate pins their determinism, these specs pin that the
  * approximations stay within their documented error envelopes at the
  * largest staged scale (sf0.1 — 100K events, 2000 vectors), so
  * "approximate by design" never silently decays into "wrong".
  */
class ApproxAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.1"

  test("a4: approx_count_distinct within HLL++ error of a1's exact counts") {
    val ev = Tables(spark, dir).events
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = SparkEntry.all("a4_approx").build(spark, dir)
      .select("event_type", "approx_users")
    val rows = approx.join(exact, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Long]("approx_users").toDouble
      val e = r.getAs[Long]("exact_users").toDouble
      // Spark's approx_count_distinct default targets 5% relative
      // standard deviation; 3 sigma = 15% is the practical envelope
      assert(math.abs(a - e) / e <= 0.15,
        s"${r.getString(0)}: approx $a vs exact $e drifts beyond 3x rsd")
    }
  }

  test("a4: approx_median sits at the true median's rank within 5%") {
    val ev = Tables(spark, dir).events
    val med = SparkEntry.all("a4_approx").build(spark, dir)
      .select("event_type", "approx_median").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    med.foreach { case (et, m) =>
      val below = ev.filter(col("event_type") === et)
        .agg(avg(when(col("value") <= m, 1.0).otherwise(0.0)))
        .head().getDouble(0)
      // the value approx_percentile returned must cover between 45%
      // and 55% of the group — rank error, the bound the sketch
      // actually promises (value-space error is unbounded)
      assert(below >= 0.45 && below <= 0.55,
        s"$et: approx median $m covers ${below * 100}% of values")
    }
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("v4/v6: ANN recall floors hold at sf0.1 (4x the unit-test corpus)") {
    val e = Tables(spark, dir).embeddings
    val q = e.filter(col("vec_id") < 10)
    val bf = pairs(Knn.bruteForce(e, q, k = 10))
    // same parameters as the registered queries
    val ivf = pairs(Knn.ivfTopK(e, q, k = 10, nlist = 16, nProbe = 4))
    val pq = pairs(Knn.pqTopK(e, q, k = 10, m = 8, ksub = 32, refine = 6))
    val rIvf = ivf.intersect(bf).size.toDouble / bf.size
    val rPq = pq.intersect(bf).size.toDouble / bf.size
    // v4 probes a quarter of the cells; v6 probes half and re-ranks
    // exactly — both floors match the sf0.001 spec's, proving recall
    // does not decay as the corpus outgrows the training sample
    assert(rIvf >= 0.3, s"IVF recall $rIvf at sf0.1")
    assert(rPq >= 0.5, s"IVF-PQ recall $rPq at sf0.1")
  }
}
