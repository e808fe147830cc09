package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.cep.{Pattern, SeqPattern, Step}
import graft.dsl.{EventStream, Tumbling}

/** Hot-key stress: the staged tables are roughly uniform, so the
  * skew machinery (SeqPattern saltBuckets, EventStream.saltedJoin)
  * was engaged only by its own scaladoc until now. This corpus gives
  * ONE user 100k events (vs 50 per cold user) — the "one user holds
  * the stream" shape that serializes an unsalted shuffle join into a
  * single task at 100 TB — and proves (a) the salt actually spreads
  * the hot key across buckets, and (b) salted output is
  * row-identical to unsalted, on the detection join, the Kleene
  * anchor join, and the enrichment join. Partitioned windows get the
  * same corpus with an exact closed-form oracle.
  */
class SkewSpec extends SparkSpec {

  private val HotN = 100000
  private val ColdUsers = 200
  private val ColdN = 50

  /** hot user 1: HotN events at 1s spacing alternating click/error;
    * cold users 1000+u: ColdN events each, same alternation. Unique
    * event_ids; value = a simple deterministic function of the id.
    */
  private lazy val skewed: DataFrame = {
    val hot = spark.range(HotN.toLong).selectExpr(
      "id AS event_id",
      "CAST(1 AS BIGINT) AS user_id",
      "timestamp_micros(1700000000000000 + id * 1000000) AS ts",
      "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'error' END AS event_type",
      "CAST(id % 97 AS DOUBLE) / 10.0 AS value")
    val cold = spark.range((ColdUsers * ColdN).toLong).selectExpr(
      "id + 10000000 AS event_id",
      "1000 + CAST(id / 50 AS BIGINT) AS user_id",
      "timestamp_micros(1700000000000000 + (id % 50) * 1000000) AS ts",
      "CASE WHEN id % 2 = 0 THEN 'click' ELSE 'error' END AS event_type",
      "CAST(id % 97 AS DOUBLE) / 10.0 AS value")
    hot.unionByName(cold)
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("salt spreads the hot key across all buckets") {
    // the exact salt expression SeqPattern/saltedJoin assign to the
    // left side, evaluated over the hot key's rows
    val salts = skewed.filter(col("user_id") === 1)
      .withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(8))
          .cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length == 8, s"expected 8 salt buckets, got ${salts.length}")
    // no bucket hoards the key: each holds well under half the rows
    assert(salts.map(_.getAs[Long]("count")).max < HotN / 2)
  }

  test("salted sequence detection is row-identical on a 100k-event hot key") {
    val steps = Seq(
      Step("a", col("event_type") === "click"),
      Step("b", col("event_type") === "error"))
    // within 5s of 1s-spaced events keeps per-anchor fan-out bounded
    val plain = SeqPattern(steps, withinSec = 5, Seq("user_id"))
      .compile(skewed)
    val salted = SeqPattern(steps, withinSec = 5, Seq("user_id"),
      saltBuckets = Some(8)).compile(skewed)
    sameRows(plain.select("a_event_id", "b_event_id"),
      salted.select("a_event_id", "b_event_id"))
    // sanity: the hot key really dominates the match set
    assert(plain.filter(col("a_user_id") === 1).count() >
      plain.filter(col("a_user_id") =!= 1).count() * 10)
  }

  test("salted Kleene anchor join is row-identical on the hot key") {
    // A -> B+ -> C with C = click too (anchors 2s apart); tight
    // within keeps run volume sane at 100k hot events
    def run(salt: Option[Int]) = {
      val pairs = SeqPattern(
        Seq(Step("a", col("event_type") === "click"),
          Step("c", col("event_type") === "click")),
        withinSec = 4, Seq("user_id"), saltBuckets = salt)
        .compile(skewed)
      val bs = skewed.filter(col("event_type") === "error")
        .select(col("user_id").as("b_user_id"),
          col("event_id").as("b_event_id"))
      pairs.join(bs,
        col("a_user_id") === col("b_user_id") &&
          col("b_event_id") > col("a_event_id") &&
          col("b_event_id") < col("c_event_id"))
        .groupBy(col("a_event_id").as("a_id"), col("c_event_id").as("c_id"))
        .agg(count(lit(1)).as("n_b"))
    }
    sameRows(run(None), run(Some(8)))
  }

  test("saltedJoin enrichment is row-identical to the plain join") {
    val dim = spark.range(ColdUsers.toLong + 2).selectExpr(
      "CASE WHEN id = 0 THEN 1 ELSE 999 + id END AS uid",
      "concat('seg_', id % 7) AS segment")
    val plain = skewed.join(dim, skewed("user_id") === dim("uid"))
      .select(col("event_id"), col("segment"))
    val salted = EventStream.saltedJoin(skewed, dim, "user_id", "uid", 8)
      .select(col("event_id"), col("segment"))
    sameRows(plain, salted)
    // left-outer flavor too (fallback enrichment path)
    val dimMissing = dim.filter(col("uid") =!= 1) // drop the hot key
    val plainL = skewed.join(dimMissing,
        skewed("user_id") === dimMissing("uid"), "left")
      .select(col("event_id"), col("segment"))
    val saltedL = EventStream.saltedJoin(
        skewed, dimMissing, "user_id", "uid", 8, "left")
      .select(col("event_id"), col("segment"))
    sameRows(plainL, saltedL)
  }

  test("partitioned tumbling windows stay exact under the hot key") {
    val got = EventStream.events(skewed)
      .partitionBy("user_id")
      .window(Tumbling("1 hour"))
      .aggregate("n" -> count(lit(1)))
    // closed form: 1s spacing -> 3600 events per full hour window;
    // 100k events = 27 full hours + a 2800-event remainder window
    val hot = got.filter(col("user_id") === 1)
    assert(hot.count() == 28)
    val ns = hot.select("n").collect().map(_.getLong(0)).sorted
    assert(ns.last == 3600 && ns.count(_ == 3600) == 27 && ns.head == 2800,
      ns.mkString(","))
    // every cold user: one window of 50
    val cold = got.filter(col("user_id") >= 1000)
    assert(cold.count() == ColdUsers.toLong)
    assert(cold.filter(col("n") =!= 50).isEmpty)
  }
}
