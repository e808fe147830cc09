package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-proof harness: times the dedup family (d1–d5) and the trend
  * aggregations (p6, p10) at sf0.1 and at a synthesized 10× scale,
  * printing per-query wall ratios. ~Linear ratios (≤ ~12× at 10×
  * data) demonstrate the plans hold their shape as data grows — the
  * 100 TB story's measurable stand-in on one machine.
  *
  * The 10× corpus is derived, not copied: each of the 10 document
  * replicas gets a replica-unique text prefix and disjoint doc_ids,
  * so near-dup relationships exist WITHIN a replica but not across —
  * pair counts and cluster sizes scale ~linearly (copying text
  * verbatim would instead multiply every dup group 10×, a quadratic
  * candidate blow-up that measures a different workload, not scale).
  * Events replicate with disjoint user_ids, preserving each user's
  * event sequences — per-key trend DP work scales linearly.
  *
  * Writes under target/ (ephemeral build dir), prints one JSON line
  * per scale plus the ratio table to stderr.
  */
object ScaleBench {

  private val Queries =
    Seq("d1_exact_dedup", "d2_ngram_jaccard", "d3_minhash_lsh",
      "d4_simhash", "d5_dedup_clusters", "d6_decontaminate",
      "d7_dup_spans", "pipe1_corpus",
      "p6_trend_count", "p10_multi_trend", "p11_greta_pred",
      "d9_span_scrub", "t12_gopher_filters", "t13_dsir",
      "t6_repetition", "t9_freq_quality", "t10_seq_pack", "t11_bm25",
      "p1_seq2", "w3_session", "v1_knn", "v3_knn_lsh", "v6_knn_ivfpq",
      "v7_semdedup", "d8_embed_decontam",
      "g2_rate_limit", "g3_circuit_breaker", "x6_vpl_trend_agg",
      "e2_asof_enrich", "pipe2_clean_corpus", "t14_bpe_merges",
      "f4_hawkes", "a2_ema", "t15_bpe_encode", "m4_mlp_score",
      "t16_temperature_mix", "t17_lm_fluency", "t18_chunk",
      "v9_hybrid_rrf", "t20_tokenizer_fertility",
      "t21_quality_classifier")

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SCALE: replica count of the derived corpus (default
    // 10; 30 gives the deeper tier that separates genuine asymptotics
    // from fixed-cost amortization). SCALEBENCH_QUERIES: comma list
    // filtering the timed set (the 30x tier focuses the dedup/ANN
    // family instead of paying 30x on every query).
    val nReps = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val scaledDir = s"target/scale$nReps"
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- stage the 10× derivation (idempotent) ----------------------
    // marker name versions the derivation: widening the query set to
    // events/embeddings consumers re-stages those tables
    val marker = new java.io.File(s"$scaledDir/_staged_v7")
    if (!marker.exists()) {
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      val reps = (0 until nReps).map { i =>
        // suffix EVERY word with the replica id: a bijective per-word
        // mapping, so within-replica shingle/word overlap (the dup
        // structure) is preserved EXACTLY while cross-replica overlap
        // is zero. The earlier one-word-prefix derivation left
        // replica copies ~0.9-jaccard similar — every base doc became
        // a 10-clique of cross-replica near-dups and pair work grew
        // quadratically with replicas (measured: d3 36x at 10x),
        // which benchmarks a different workload, not scale. Replica 0
        // is suffixed too, so per-doc compute is uniform.
        //
        // doc_id derivation holds the BENCHMARK side of d6/s29/pipe1
        // (docs with doc_id % 7 == 0) at its ORIGINAL fixed size:
        // only replica 0's original benchmark docs keep residue 0;
        // every other (doc, replica) gets a nonzero residue. A real
        // eval set does not grow 30x when the training corpus does —
        // the old +i*1e8 offsets replicated the benchmark with the
        // corpus, so decontamination ratios measured an eval set
        // scaling that never happens in production. The map
        // (doc_id*nReps + i)*7 + c with c in [0,6] is injective
        // across (doc_id, i).
        val b = col("doc_id") % 7
        val c = when(b === 0 && lit(i) === 0, lit(0L))
          .otherwise((b + lit(i)) % 6 + 1)
        docs.withColumn("doc_id", (col("doc_id") * nReps + i) * 7 + c)
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"$$1r$i"))
      }
      // events land as a single parquet FILE (the shape every
      // recorded streaming ev/s row was measured under). Documents
      // stay a DIRECTORY: v6 briefly single-filed them and batch scan
      // parallelism collapsed to the file's 2-3 row groups (t20 read
      // 40x instead of 4x) — streamDir now flattens directory tables
      // into per-part symlinks instead, so the stream side reads them
      // too (a directory symlink used to feed readStream ZERO rows,
      // which silently voided documents-based stream-twin numbers at
      // the scaled tiers).
      def writeSingleFile(df: DataFrame, table: String): Unit = {
        val tmp = s"$scaledDir/${table}_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") &&
            f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file under $tmp"))
        val dest = java.nio.file.Paths.get(s"$scaledDir/$table.parquet")
        // a previous derivation may have left a directory-shaped
        // table — delete it recursively (bottom-up) so a partitioned
        // write's subdirectories don't survive File.delete() and
        // crash the move
        if (dest.toFile.isDirectory) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dest).sorted(
            java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .iterator().asScala.foreach(java.nio.file.Files.delete)
        }
        java.nio.file.Files.deleteIfExists(dest)
        java.nio.file.Files.move(part.toPath, dest)
        new java.io.File(tmp).listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(tmp))
      }
      reps.reduce(_.unionByName(_)).write.mode("overwrite")
        .parquet(s"$scaledDir/documents.parquet")
      val events = spark.read.parquet(s"$baseDir/events.parquet")
      val evReps = (0 until nReps).map { i =>
        events.withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000000L))
      }
      writeSingleFile(evReps.reduce(_.unionByName(_)), "events")
      // embeddings: disjoint vec_ids AND disjoint labels per replica,
      // vectors unchanged — the v1/v3 query side stays the fixed
      // vec_id<10 broadcast set, so the measurement is corpus-side
      // scan/bucket scaling. Labels must scale WITH the corpus (v5,
      // the documents word-suffix lesson re-learned for v2): the base
      // table has 10 labels over 2k rows, and keeping them fixed at
      // 100x grows each label block 100x denser — v2's within-block
      // pair candidates then grow 10^4x and the measured 258x was the
      // block-join's quadratic candidate count, a derivation artifact,
      // not a plan property. A real 100x corpus has ~100x the label
      // values at the same per-label density; replica-disjoint labels
      // model exactly that (same-key density constant, the users/
      // words derivation principle).
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      val embReps = (0 until nReps).map { i =>
        if (i == 0) emb
        else emb.withColumn("vec_id", col("vec_id") + lit(i * 100000000L))
          .withColumn("label", col("label") + lit(i * 1000))
      }
      embReps.reduce(_.unionByName(_)).write.mode("overwrite")
        .parquet(s"$scaledDir/embeddings.parquet")
      marker.getParentFile.mkdirs()
      java.nio.file.Files.createFile(marker.toPath)
    }

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    materialize(SparkEntry.queries("d1_exact_dedup")(spark, baseDir))
    // First-touch every table at BOTH scales before timing (Bench's
    // tier-3 lesson, re-learned at 30x: the scaled corpus is ~GBs and
    // whichever query ran FIRST at the scaled dir absorbed its entire
    // cold read — d1 showed 13x, pipe1 7.6x, purely by list position;
    // warm, both return to their real ratios).
    for (dir <- Seq(baseDir, scaledDir);
         f <- Option(new java.io.File(dir).listFiles())
           .getOrElse(Array.empty[java.io.File])
         if f.getName.endsWith(".parquet"))
      materialize(spark.read.parquet(f.getPath))

    val timed = sys.env.get("SCALEBENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Queries)
    // min-of-2 passes per scale (same rationale as Bench): one noisy
    // window must not mint a phantom asymptote in a recorded ratio
    def timeAll(dir: String): Seq[(String, Double)] = {
      def pass(): Seq[(String, Double)] = timed.map { name =>
        val t0 = System.nanoTime()
        materialize(SparkEntry.queries(name)(spark, dir))
        name -> (System.nanoTime() - t0) / 1e9
      }
      val a = pass(); val b = pass().toMap
      a.map { case (n, s) => n -> math.min(s, b(n)) }
    }
    val base = timeAll(baseDir)
    val scaled = timeAll(scaledDir)
    def jline(tag: String, xs: Seq[(String, Double)]): String =
      s"""{"scale":"$tag","queries":{""" +
        xs.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}}"
    println(jline("sf0.1", base))
    println(jline(s"sf0.1x$nReps-derived", scaled))
    // ratio is time growth at nReps-times the data; %lin normalizes it
    // against perfectly linear scaling (100% = time grew exactly with
    // the data; <100% = sublinear). A floor-dominated base (d1's one
    // md5 shuffle costs ~0.3s of scheduling at sf0.1) inflates the raw
    // ratio while %lin stays honest — superlinearity would show as
    // >100%, and nothing may exceed it.
    System.err.println(
      f"${"query"}%-20s ${"sf0.1"}%8s ${nReps + "x"}%8s ratio  %%lin")
    base.zip(scaled).foreach { case ((n, b), (_, s)) =>
      System.err.println(
        f"$n%-20s $b%8.2f $s%8.2f ${s / b}%5.1fx ${s / b / nReps * 100}%5.0f%%")
    }

    // ---- streaming throughput tier ----------------------------------
    // The batch family above is measured to 100x; this tier drives the
    // fMGWS/state-store family at the SAME derived event volumes and
    // reports the reference's own unit (ev/s) plus the state-store
    // peak per micro-batch — the number that says whether state stays
    // bounded as volume grows. A StreamingQueryListener harvests
    // progress from the queries' internal memory-sink runs, so the
    // registered plans are measured UNCHANGED. SCALEBENCH_STREAMING=0
    // skips; SCALEBENCH_STREAM_QUERIES filters.
    if (sys.env.getOrElse("SCALEBENCH_STREAMING", "1") != "0") {
      val recorder = new StreamStatsListener
      spark.streams.addListener(recorder)
      val sQueries = sys.env.get("SCALEBENCH_STREAM_QUERIES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq("s2_stream_pattern", "s9_stream_ema",
          "s16_stream_trend", "s23_stream_multi_pattern",
          "s35_stream_asof_enrich"))
      final case class SRun(rows: Long, sec: Double, statePeak: Long,
          batches: Long) {
        def evPerSec: Double = if (sec > 0) rows / sec else 0.0
      }
      // best-of-2: throughput tiers report the machine's capability,
      // and one noisy window must not understate it
      def runOnce(name: String, dir: String): SRun = {
        recorder.reset()
        val t0 = System.nanoTime()
        materialize(SparkEntry.queries(name)(spark, dir))
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain async listener events
        SRun(recorder.inputRows.get(), sec, recorder.statePeak.get(),
          recorder.batches.get())
      }
      def run(name: String, dir: String): SRun = {
        val a = runOnce(name, dir); val b = runOnce(name, dir)
        if (a.evPerSec >= b.evPerSec) a else b
      }
      System.err.println(
        f"${"stream query"}%-26s ${"scale"}%14s ${"events"}%9s " +
          f"${"wall"}%7s ${"ev/s"}%10s ${"state^"}%8s batches")
      val lines = for (tag <- Seq("sf0.1" -> baseDir,
          s"x$nReps" -> scaledDir); name <- sQueries) yield {
        val r = run(name, tag._2)
        System.err.println(
          f"$name%-26s ${tag._1}%14s ${r.rows}%9d ${r.sec}%7.2f " +
            f"${r.evPerSec}%10.0f ${r.statePeak}%8d ${r.batches}%7d")
        s""""${Bench.shortName(name)}_${tag._1}":{"rows":${r.rows},""" +
          s""""sec":${r.sec},"ev_s":${r.evPerSec.toLong},""" +
          s""""state_peak":${r.statePeak},"batches":${r.batches}}"""
      }
      println(s"""{"scale":"streaming","tiers":{${lines.mkString(",")}}}""")
      spark.streams.removeListener(recorder)
    }
    spark.stop()
  }
}

/** Harvests micro-batch progress from whatever streaming query runs
  * while attached: total input rows, max state-store rows across all
  * stateful operators and batches, batch count.
  */
final class StreamStatsListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  val inputRows = new java.util.concurrent.atomic.AtomicLong
  val statePeak = new java.util.concurrent.atomic.AtomicLong
  val batches = new java.util.concurrent.atomic.AtomicLong
  def reset(): Unit = { inputRows.set(0); statePeak.set(0); batches.set(0) }
  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    inputRows.addAndGet(e.progress.numInputRows)
    batches.incrementAndGet()
    e.progress.stateOperators.foreach { so =>
      statePeak.getAndUpdate(m => math.max(m, so.numRowsTotal))
    }
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
}
