package graft

import graft.vpl.Vpl

/** Randomized cross-path equivalence for the pattern engine: the SAME
  * VPL program over the SAME pseudo-random .evt scenario must produce
  * identical rows through the batch compiler (time-range joins) and
  * the streaming compiler (flatMapGroupsWithState NFA).
  *
  * The fixed-scenario parity specs (StreamingKleeneSpec,
  * VplCoverageSpec) pin known shapes; this spec hunts the edge cases
  * scripted data misses — several events sharing one BATCH timestamp,
  * key interleavings, runs cut exactly by the `within` horizon, empty
  * match sets. Seeds are fixed, so failures reproduce.
  *
  * Values are generated as exact quarter multiples so double sums are
  * order-independent — the two paths aggregate in different orders,
  * and a last-ulp difference would be a false alarm, not a real
  * semantic divergence.
  */
class VplCrossPathPropertySpec extends SparkSpec {

  /** ~50 events of types A/B/C over 3 keys; 1-3 events per BATCH
    * (shared timestamps), gaps from 100 ms to 130 s so some pairs
    * fall just inside and some just outside the 2-minute `within`.
    */
  private def genEvt(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    val sb = new StringBuilder
    var ms = 0L
    var emitted = 0
    while (emitted < 50) {
      val burst = 1 + rnd.nextInt(3)
      for (_ <- 0 until burst) {
        val tpe = Seq("A", "B", "C")(rnd.nextInt(3))
        val k = 1 + rnd.nextInt(3)
        val v = rnd.nextInt(400) * 0.25
        sb.append(s"$tpe { k: $k, v: $v }\n")
        emitted += 1
      }
      ms += Seq(100L, 700L, 5000L, 40000L, 130000L)(rnd.nextInt(5))
      sb.append(s"BATCH $ms\n")
    }
    sb.toString
  }

  private val eventDecls =
    """event A:
      |    k: int
      |    v: float
      |event B:
      |    k: int
      |    v: float
      |event C:
      |    k: int
      |    v: float
      |""".stripMargin

  private val programs: Map[String, String] = Map(
    "seq2-correlated" ->
      s"""$eventDecls
         |stream Out = A as a
         |    -> B where k == a.k as b
         |    .within(2m)
         |    .watermark(out_of_order: 1s)
         |    .emit(a_id: a.event_id, b_id: b.event_id, key: a.k)
         |""".stripMargin,
    "seq2-pred-negation" ->
      s"""$eventDecls
         |stream Out = A as a
         |    -> B where k == a.k and v > a.v as b
         |    .within(2m)
         |    .not(C where k == a.k)
         |    .watermark(out_of_order: 1s)
         |    .emit(a_id: a.event_id, b_id: b.event_id)
         |""".stripMargin,
    "kleene-plus" ->
      s"""$eventDecls
         |pattern Burst = SEQ(
         |    A as a,
         |    B+ as bs,
         |    C as c
         |) within 2m partition by k
         |
         |stream Out = Burst
         |    .watermark(out_of_order: 1s)
         |    .emit(a_id: a.event_id, c_id: c.event_id, n_b: len(bs),
         |          sum_b: sum(bs.v))
         |""".stripMargin,
    "kleene-star" ->
      s"""$eventDecls
         |pattern Maybe = SEQ(
         |    A as a,
         |    B* as bs,
         |    C as c
         |) within 2m partition by k
         |
         |stream Out = Maybe
         |    .watermark(out_of_order: 1s)
         |    .emit(a_id: a.event_id, c_id: c.event_id, n_b: len(bs),
         |          last_b: bs.event_id, first_b: bs.first_event_id)
         |""".stripMargin,
    // windowed aggregation: quarter-valued sums are exact in both the
    // batch aggregation and the streaming window state
    "windowed-agg" ->
      s"""$eventDecls
         |stream Out = B
         |    .watermark(out_of_order: 1s)
         |    .partition_by(k)
         |    .window(1m)
         |    .aggregate(n: count(), total: sum(v), hi: max(v))
         |    .emit(key: k, n: n, total: total, hi: hi)
         |""".stripMargin,
    // .score with the deterministic stand-in model — a stateless map,
    // so batch and streaming must agree row for row
    "score-map" ->
      s"""$eventDecls
         |stream Out = A
         |    .watermark(out_of_order: 1s)
         |    .score(model: "m.onnx", inputs: [v], outputs: [p1, p2])
         |    .emit(id: event_id, key: k, p1: p1, p2: p2)
         |""".stripMargin)

  private def writeEvt(text: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_prop", ".evt")
    java.nio.file.Files.writeString(f, text)
    f.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.filterNot(_ == "ts").sorted
    df.select(cols.head, cols.tail: _*)
      .collect().map(_.toString).sorted.toSeq
  }

  for (seed <- Seq(11, 22, 23, 47); (name, vpl) <- programs)
    test(s"cross-path parity: $name over random scenario seed=$seed") {
      val evt = writeEvt(genEvt(seed))
      val batch = Vpl.runEvt(spark, vpl, Seq(evt))("Out").get
      val streamed = Vpl.runEvtStreaming(spark, vpl, evt, "Out")
      assert(rows(streamed) == rows(batch),
        s"seed=$seed program=$name\nstreaming=${rows(streamed)}\nbatch=${rows(batch)}")
    }
}
