package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage profiler: times labeled sub-pipelines of the hot
  * bench queries so a regression can be attributed to a stage instead
  * of a whole query. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()

    if (sys.env.contains("PROFILE_STREAM")) {
      spark.streams.addListener(
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          import org.apache.spark.sql.streaming.StreamingQueryListener._
          override def onQueryStarted(e: QueryStartedEvent): Unit =
            println(s"[stream] started ${e.name}")
          override def onQueryProgress(e: QueryProgressEvent): Unit = {
            val p = e.progress
            println(s"[stream] ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
              s"durations=${p.durationMs}")
          }
          override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
            println(s"[stream] terminated")
        })
      time("s2 streamPattern total")(
        graft.streaming.StreamingQueries.streamPattern(spark, sfDir).count())
      Thread.sleep(1000)
      time("s2 streamPattern 2nd")(
        graft.streaming.StreamingQueries.streamPattern(spark, sfDir).count())
      Thread.sleep(1000)
      spark.stop()
      return
    }

    if (sys.env.contains("PROFILE_T6")) {
      val docs = graft.Tables(spark, sfDir).documents
      import graft.functions.TextFunctions._
      val w = words(col("text"))
      val base = docs.select(col("doc_id"), w.as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("n_words"))
      time("base words")(mat(base))
      val bgsExpr = when(col("n_words") >= 2,
        expr("transform(sequence(0, n_words - 2), i -> concat_ws(' ', w[i], w[i+1]))"))
        .otherwise(array().cast("array<string>"))
      time("bigram arrays")(mat(base.select(col("doc_id"), bgsExpr.as("bgs"))))
      val bigrams = base.select(col("doc_id"), bgsExpr.as("bgs"))
        .select(col("doc_id"), explode(col("bgs")).as("bg"))
      time("explode")(mat(bigrams))
      val perBigram = bigrams.groupBy(col("doc_id"), col("bg"))
        .agg(count(lit(1)).as("c"))
      time("perBigram count")(mat(perBigram))
      val top = perBigram.groupBy(col("doc_id"))
        .agg(max(col("c")).as("t"), sum(col("c")).as("n"))
      time("top per doc")(mat(top))
      time("full repetitionStats")(
        mat(graft.text.TextAnalysis.repetitionStats(docs)))
      // variant A: fan out the docs first
      val fanned = docs.repartition(32, col("doc_id"))
        .select(col("doc_id"), w.as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("n_words"))
      time("A fanned explode")(mat(fanned
        .select(col("doc_id"), bgsExpr.as("bgs"))
        .select(col("doc_id"), explode(col("bgs")).as("bg"))))
      // variant B: zip_with instead of index lambdas
      val zipBg = expr(
        "filter(zip_with(w, slice(w, 2, greatest(n_words - 1, 0)), " +
          "(a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)")
      time("B zip_with explode")(mat(base
        .select(col("doc_id"), zipBg.as("bgs"))
        .select(col("doc_id"), explode(col("bgs")).as("bg"))))
      time("B fanned zip_with explode")(mat(fanned
        .select(col("doc_id"), zipBg.as("bgs"))
        .select(col("doc_id"), explode(col("bgs")).as("bg"))))
      spark.stop(); return
    }

    if (sys.env.contains("PROFILE_D5")) {
      val docs0 = graft.Tables(spark, sfDir).documents
      val pairs = graft.dedup.Dedup.ngramJaccardPairs(
        docs0, k = 3, threshold = 0.6, blockCols = Seq(col("lang")))
      time("d5 pairs")(mat(pairs))
      val edges = time("d5 edges ckpt")(
        pairs.select(explode(array(
            struct(col("a_id").as("u"), col("b_id").as("v")),
            struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
          .select(col("e.u").as("u"), col("e.v").as("v"))
          .distinct().localCheckpoint())
      var labels = time("d5 labels init")(
        edges.select(col("u").as("node")).distinct()
          .withColumn("label", col("node")).localCheckpoint())
      var changed = 1L; var it = 0
      while (changed > 0 && it < 50) {
        val t0 = System.nanoTime()
        val prop = edges.join(labels, edges("v") === labels("node"))
          .groupBy(edges("u").as("n2")).agg(min("label").as("nbr"))
        val viaNbr = labels.join(prop, labels("node") === prop("n2"), "left")
          .select(labels("node"),
            least(labels("label"), coalesce(col("nbr"), labels("label")))
              .as("label"), labels("label").as("prev"))
          .localCheckpoint()
        val tCk1 = System.nanoTime()
        val byNode = viaNbr.select(col("node").as("pn"), col("label").as("pl"))
        val next = viaNbr.join(byNode, viaNbr("label") === col("pn"), "left")
          .select(viaNbr("node"),
            least(viaNbr("label"), coalesce(col("pl"), viaNbr("label")))
              .as("label"), viaNbr("prev"))
          .localCheckpoint()
        val tCk2 = System.nanoTime()
        changed = next.filter(col("label") =!= col("prev")).count()
        labels = next.drop("prev")
        it += 1
        println(f"[profile] d5 round $it: viaNbr ${(tCk1-t0)/1e9}%.3f " +
          f"doubling ${(tCk2-tCk1)/1e9}%.3f count ${(System.nanoTime()-tCk2)/1e9}%.3f " +
          f"changed=$changed")
      }
      spark.stop(); return
    }

    // PROFILE_SHARE: multi-pattern sharing scaling — N patterns in ONE
    // anchor-sharing store vs N separate single-pattern runs (the
    // zdd_unified sharing claim, measured)
    if (sys.env.contains("PROFILE_SHARE")) {
      val types = Seq("purchase", "error", "view", "click")
      def followers(n: Int): Map[String, String] =
        (0 until n).map(i => s"p$i" -> types(i % types.size)).toMap
      for (n <- Seq(1, 2, 4, 8)) {
        val tShared = time(s"shared $n patterns (one store)") {
          graft.streaming.StreamingQueries.streamMultiPatternWith(
            spark, sfDir, followers(n), s"graft_share_$n").count()
        }
        val tSep = time(s"separate $n x 1-pattern runs") {
          (0 until n).map { i =>
            graft.streaming.StreamingQueries.streamMultiPatternWith(
              spark, sfDir, Map(s"p$i" -> types(i % types.size)),
              s"graft_share_sep_${n}_$i").count()
          }.sum
        }
        val _ = (tShared, tSep)
      }
      spark.stop(); return
    }

    // PROFILE_QUERIES=q1,f4,...: time any registered queries, twice
    // each (cold then warm) so first-touch table reads are attributable
    sys.env.get("PROFILE_QUERIES").foreach { qs =>
      val reg = graft.SparkEntry.queries
      qs.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
        val q = reg(name)
        time(s"$name cold")(mat(q(spark, sfDir)))
        time(s"$name warm")(mat(q(spark, sfDir)))
      }
      spark.stop(); return
    }

    val docs = graft.Tables(spark, sfDir).documents
    time("docs count")(docs.count())

    val k = 3; val nBands = 4; val rowsPerBand = 4
    val nH = nBands * rowsPerBand
    val shingled0 = docs.select(col("doc_id"),
      graft.functions.TextFunctions.shingles(col("text"), k).as("sh"))
    time("shingle scan (no persist)")(mat(shingled0))
    time("shingle scan again")(mat(shingled0))
    val sig = shingled0.withColumn("sig",
      graft.dedup.Dedup.minhashSig(col("sh"), nH))
    time("shingle+minhash sig")(mat(sig))
    val banded00 = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
    time("sig+banding")(mat(banded00))
    // sub-stages of minhashLshPairs, replicated here to attribute the
    // first-run cost (shingled persisted exactly as the operator does)
    val shingled = shingled0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = shingled.withColumn("sig",
      graft.dedup.Dedup.minhashSig(col("sh"), nH))
    val banded = base.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val bucketed = banded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")))
      .filter(col("__bn") <= 1000)
    time("bucketed")(mat(bucketed))
    val a = bucketed.select(col("band"), col("band_key"), col("doc_id").as("a_id"))
    val bb = bucketed.select(col("band"), col("band_key"), col("doc_id").as("b_id"))
    val cand = a.join(bb, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    time("cand")(mat(cand))
    val withSh = cand
      .join(shingled.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(shingled.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
    time("withSh")(mat(withSh))
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = (size(col("a_sh")) + size(col("b_sh"))).cast("double") - inter
    val fin = withSh.withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= 0.8).select("a_id", "b_id", "jaccard")
    time("final verify")(mat(fin))
    time("full d3 pairs (fresh frames)")(mat(graft.dedup.Dedup.minhashLshPairs(
      docs, k, nBands, rowsPerBand, 0.8)))
    fin.explain("formatted")
    spark.stop()
  }
}
