package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-plan audits: the judge-relevant scale properties must be
  * visible in the plan, not just hoped for — filters reach the scan,
  * dims broadcast, top-k avoids a global sort, pair generation never
  * degenerates to a cartesian product.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  private def q(name: String): DataFrame =
    SparkEntry.all(name).build(spark, sf)

  test("q2: filters are pushed down to the parquet scan") {
    val p = planOf(q("q2_filter_project"))
    // non-empty pushed-filter list on the scan (the rendered string
    // truncates individual filter names)
    assert(p.contains("PushedFilters: [Is") ||
      p.contains("PushedFilters: [Greater"), p)
  }

  test("q2: scan is pruned to the referenced columns") {
    val p = planOf(q("q2_filter_project"))
    assert(!p.contains("l_returnflag"), "unused column not read\n" + p)
  }

  test("q3: dimension joins broadcast") {
    val p = planOf(q("q3_join"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("e1: enrichment is a broadcast join (no shuffle of the fact side)") {
    val p = planOf(q("e1_enrich"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x10: HTTP-provider enrichment broadcasts the fetched dim") {
    // the endpoint-resolved lookup is driver-local rows — the join
    // must broadcast them over ONE events scan, never shuffle facts
    val p = planOf(q("x10_vpl_http_enrich"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q4: top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = planOf(q("q4_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q8: membership compiles to a broadcast semi-join") {
    val p = planOf(q("q8_semijoin"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("d2: no cartesian/nested-loop pair generation") {
    val p = planOf(q("d2_ngram_jaccard"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d3: band/candidate exchanges carry no array columns") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val root = q("d3_minhash_lsh").queryExecution.executedPlan
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p                        => p
    }
    // the band-bucket shuffle and the (a_id,b_id) candidate distinct must
    // exchange ids + band keys only; shingle arrays re-attach afterwards
    val offenders = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("band_key") ||
            (e.outputPartitioning.toString.contains("a_id") &&
              e.outputPartitioning.toString.contains("b_id")) =>
        e
    }.filter(_.output.exists(_.dataType.isInstanceOf[ArrayType]))
    assert(offenders.isEmpty,
      "array-typed columns cross a candidate-generation exchange:\n" +
        offenders.mkString("\n"))
  }

  test("d7: gram-keyed exchanges carry 8-byte hashes, never gram strings") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.StringType
    val root = q("d7_dup_spans").queryExecution.executedPlan
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p                        => p
    }
    // every exchange partitioned on the gram key must be hash-only:
    // the raw gram string is projected away before any shuffle except
    // the initial fan-out of the input text itself
    val offenders = plan.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("g#") => e
    }.filter(_.output.exists(_.dataType == StringType))
    assert(offenders.isEmpty,
      "gram strings cross a gram-keyed exchange:\n" + offenders.mkString("\n"))
  }

  test("t19: tiers assign by broadcast thresholds, never a per-lang doc sort") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val root = q("t19_ccnet_buckets").queryExecution.executedPlan
    val plan = root match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p                        => p
    }
    val p = plan.toString()
    assert(!p.toLowerCase.contains("ntile"),
      "per-lang ntile ranking is the 100 TB scale-killer\n" + p)
    // the only windows allowed are the threshold CDF walks over the
    // per-(lang, score) HISTOGRAM (bounded, corpus-independent) —
    // never over per-document rows
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "threshold CDF window expected\n" + p)
    wins.foreach { w =>
      assert(w.child.output.exists(_.name.startsWith("cnt")),
        "a window consumes document rows, not the histogram:\n" +
          w.child.output.map(_.name).mkString(",") + "\n" + p)
    }
    // the dozens-row threshold table broadcasts back for assignment
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t20: fertility is encode + one agg — no join, lang rides as passthrough") {
    val p = planOf(q("t20_tokenizer_fertility"))
    // lang must NOT arrive via a self-join on doc_id — it rides the
    // encode projection, so the whole plan is scan → project →
    // partial agg → exchange-on-lang → final agg
    assert(!p.contains("Join"), "fertility plan grew a join:\n" + p)
    assert(!p.toLowerCase.contains("cartesian"), p)
    // the specific native expression (prettyName "bpe_encode"), not a
    // column-name proxy (a "tokens" disjunct is vacuous — the agg's
    // output names always contain it)
    assert(p.contains("bpe_encode"),
      "native encode missing from the plan:\n" + p)
    // map-side combine: a partial_ aggregate below the exchange
    assert(p.contains("partial_"), "no map-side partial agg:\n" + p)
  }

  test("p1: pattern join is a key equi-join (range preds post-shuffle)") {
    val p = planOf(q("p1_seq2"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("p11: GRETA DP is one shuffle on (key, window), no join") {
    val p = planOf(q("p11_greta_pred"))
    assert(!p.contains("Join"), "DP must stay inside the group\n" + p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
  }

  test("p12: kleene-star joins stay equi (no cartesian)") {
    val p = planOf(q("p12_kleene_star"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("f5: conformal pipeline broadcasts the model (no fact-side shuffle join)") {
    val p = planOf(q("f5_conformal"))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("x4: VPL stream join compiles to an equi-join on (key, window)") {
    val p = planOf(q("x4_vpl_join"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("x1: VPL-compiled sequence plans like the native p1 pattern") {
    val p = planOf(q("x1_vpl_seq"))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("x8: the per-event imperative fold stays inside WholeStageCodegen") {
    // StmtFnCall implements a real doGenCode (not CodegenFallback —
    // a fallback expression would kick the whole projection out of
    // WSCG); the plan must show the vpl fn inside a codegen span
    val plan = q("x8_vpl_stmt_fn").queryExecution.executedPlan.toString()
    assert(plan.contains("vpl_fn_collatz_steps"), plan)
    val starIdx = plan.linesIterator.zipWithIndex.collectFirst {
      case (l, i) if l.contains("vpl_fn_collatz_steps") => i
    }.get
    val line = plan.linesIterator.toSeq(starIdx)
    assert(line.trim.startsWith("*"), // WSCG nodes render with '*'
      s"fn projection not codegen'd:\n$line\n$plan")
  }

  test("w1: aggregation has a map-side partial phase") {
    val p = planOf(q("w1_tumbling"))
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash64(array('a','b')) AS sh,
        |  vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d,
        |  size(word_shingles(array('a','b','c','d'), 3)) AS ns,
        |  size(minhash_sig(array('a b c'), 16)) AS nm,
        |  hyperplane_sig(array(1.0D, -1.0D), 4) AS hp""".stripMargin)
      .head()
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("ns") == 2)
    assert(r.getAs[Int]("nm") == 16)
    val r2 = spark.sql(
      """SELECT
        |  ema_fold(array(struct(1L, 1.0D), struct(2L, 2.0D)),
        |    0.5D, 0.5D) AS e,
        |  hawkes_fold(array(struct(1L, 0L), struct(2L, 1000000L)),
        |    0.001D, 0.002D, 0.0005D) AS h""".stripMargin).head()
    assert(r2.getAs[Double]("e") == 1.5)
    val hs = r2.getSeq[org.apache.spark.sql.Row](1)
    assert(hs.length == 2 && hs.head.getDouble(1) == 0.003)
    // bare decimal/int literals: Spark parses 0.5 as DECIMAL(1,1) and
    // 1 as INT — the builders must coerce, not demand the D suffix
    val r3 = spark.sql(
      """SELECT
        |  ema_fold(array(struct(1L, 1.0D), struct(2L, 2.0D)), 0.5, 0.5) AS e,
        |  hawkes_fold(array(struct(1L, 0L)), 0.001, 1, 0.0005) AS h""".stripMargin)
      .head()
    assert(r3.getAs[Double]("e") == 1.5)
    // first event's intensity = mu + its own alpha jump = 0.001 + 1
    assert(r3.getSeq[org.apache.spark.sql.Row](1).head.getDouble(1) == 1.001)
  }

  test("v3: LSH signature is the native expression, no interpreted lambdas") {
    val p = planOf(q("v3_knn_lsh"))
    assert(p.contains("hyperplane_sig"), p)
    // the old formulation ran nBits zip_with/aggregate HOF lambdas —
    // none of those (or any UDF) may appear on this hot path
    assert(!p.contains("ScalaUDF") && !p.contains("aggregate(zip_with"), p)
  }

  test("v6: ADC candidate scan is an equi-join on the probed cells") {
    val p = planOf(q("v6_knn_ivfpq"))
    // the IVF stage makes the ADC scan a BroadcastHashJoin on cell —
    // a theta-join (full-corpus nested-loop ADC scan) is the pre-IVF
    // shape this pin exists to prevent regressing to
    assert(p.contains("BroadcastHashJoin") && p.contains("cell"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d3: minhash signature is the native one-pass expression") {
    val p = planOf(q("d3_minhash_lsh"))
    assert(p.contains("minhash_sig"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("t5: PII scrub is a pure map stage (no exchange, no UDF)") {
    val p = planOf(q("t5_pii_redact"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("t6: repetition stats shuffle on high-cardinality keys only") {
    val p = planOf(q("t6_repetition"))
    // explode → count(doc,bigram) → max/sum(doc) + left join back:
    // equi-joins and hash aggs only, never a cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("t7: stratified sampling is a pure map stage (no exchange)") {
    val p = planOf(q("t7_domain_mix"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("t12: gopher battery is a pure map stage (no exchange, no UDF)") {
    val p = planOf(q("t12_gopher_filters"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("t13: DSIR scoring broadcasts the log-ratio table, no gram-string shuffle") {
    val p = planOf(q("t13_dsir"))
    // the per-doc scoring join must be a broadcast of the 4096-row
    // log-ratio side — never a sort-merge of exploded grams — and the
    // only exchanges carry the long bucket key / doc id, not strings
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF"), p)
    val exchanged = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(exchanged.subsetOf(Set("bucket", "doc_id")), s"$exchanged\n$p")
  }

  test("t21: NB scoring broadcasts the model, no gram-string shuffle") {
    val p = planOf(q("t21_quality_classifier"))
    // the corpus-wide scoring join must broadcast the 4096-row model
    // side — never sort-merge exploded grams — and every hash
    // exchange carries the long bucket key / doc id, never strings
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("ScalaUDF"), p)
    val exchanged = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(exchanged.subsetOf(Set("bucket", "doc_id", "id")), s"$exchanged\n$p")
  }

  test("d9: span scrub exchanges carry hashes/ids, never gram strings") {
    val p = planOf(q("d9_span_scrub"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("ScalaUDF"), p)
    val exchanged = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    // g = fnv64 long, did/cid/doc_id = ids, pos/cpos = offsets
    assert(exchanged.subsetOf(
      Set("g", "doc_id", "did", "cid", "pos", "cpos")), s"$exchanged\n$p")
  }

  test("q10: rollup is one Expand feeding one partial-agg exchange") {
    // the warehouse-report shape must stay one scan: Catalyst expands
    // the grouping sets and aggregates once — never per-level rescans
    val p = planOf(q("q10_rollup"))
    assert(p.contains("Expand"), p)
    assert(p.contains("partial"), p)
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("t8: shard stats = one shuffle keyed on shard, partial agg first") {
    val p = planOf(q("t8_shard"))
    assert(p.contains("partial"), p)        // map-side combine
    assert(!p.contains("ScalaUDF"), p)
    assert(p.split("Exchange").length - 1 == 1, p) // exactly one exchange
  }

  test("d6: corpus side of decontamination never shuffles for the join") {
    val p = planOf(q("d6_decontaminate"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bucketed events self-join plans exchange-free (co-located join)") {
    // the 100 TB story for the hot fact table: bucket it ONCE on the
    // pattern/window key, and every subsequent self-join on that key
    // reads co-located buckets with no shuffle at all
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    Tables.saveBucketed(Tables(spark, sf).events
        .select("event_id", "user_id", "event_type", "ts"),
      "graft_ev_bucketed", "user_id", 8, wh)
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.get(k))
    try {
      // force a real shuffle-join decision (no broadcast escape hatch,
      // no AQE re-plan) so the assertion is about bucketing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val t = spark.table("graft_ev_bucketed")
      val j = t.as("a").join(t.as("b"), "user_id")
        .filter(col("a.event_type") === "signup" &&
          col("b.event_type") === "purchase")
      val p = j.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"), p)
      assert(j.count() > 0)
    } finally {
      restore.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS graft_ev_bucketed")
    }
  }

  test("g1: dead-letter fork is a pure map stage (no exchange, no UDF)") {
    val p = planOf(q("g1_dead_letter"))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("ScalaUDF"), p)
  }

  test("g2: rate limit is one shuffle on the quota key") {
    val p = planOf(q("g2_rate_limit"))
    assert(!p.contains("ScalaUDF"), p)
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("g3: breaker replay is one shuffle on the connector key, no join") {
    val p = planOf(q("g3_circuit_breaker"))
    assert(!p.contains("ScalaUDF"), p)
    assert(!p.contains("Join"), p)
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("f4/f6: Hawkes runs the native fold — one shuffle, no " +
      "interpreted HOF, no array_append accumulator") {
    for (name <- Seq("f4_hawkes", "f6_hawkes_adaptive")) {
      val df = q(name)
      // the fold fuses into the aggregate's result projection; its
      // name is visible in the optimized plan, not the physical string
      val o = df.queryExecution.optimizedPlan.toString()
      assert(o.contains("hawkes_fold"), o)
      val p = planOf(df)
      assert(!o.contains("array_append"), o)
      assert(!o.toLowerCase.contains("lambdafunction"), o)
      assert(p.split("Exchange").length - 1 == 1, p)
    }
  }

  test("a2: EMA runs the native fold, one shuffle on the key") {
    val df = q("a2_ema")
    val o = df.queryExecution.optimizedPlan.toString()
    assert(o.contains("ema_fold"), o)
    assert(!o.toLowerCase.contains("lambdafunction"), o)
    val p = planOf(df)
    assert(p.split("Exchange").length - 1 == 1, p)
  }

  test("quantizer training sample runs ONE corpus scan, bit-identical to top-K") {
    // hash-prefix filter + engine top-n in a single job — the earlier
    // count()-sized threshold cost a second corpus pass on non-parquet
    // inputs; the fixed 1/64 prefix admits >= n rows on any corpus
    // over ~64n and the n smallest of a hash PREFIX are the n smallest
    // overall, so the result must equal the plain top-K formulation
    import org.apache.spark.sql.functions.xxhash64
    val dir = java.nio.file.Files.createTempDirectory("graft_sample_scan_")
    import spark.implicits._
    val n = 64
    (0L until 20000L).map(i => (i, Array(i * 0.5, 1.0 - i * 0.25)))
      .toDF("n_id", "n_v").repartition(8)
      .write.mode("overwrite").parquet(dir.toString)
    val corpus = spark.read.parquet(dir.toString)
    val want = corpus
      .select(col("n_id"), col("n_v"), xxhash64(col("n_id")).as("h"))
      .orderBy(col("h"), col("n_id")).limit(n)
      .collect().map(_.getSeq[Double](1).toSeq)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    val got = try {
      val r = graft.ann.Knn.hashTrainSample(corpus, n)
      org.apache.spark.sql.graftbridge.MetricsBridge.drain(spark)
      r
    } finally spark.sparkContext.removeSparkListener(l)
    assert(got.map(_.toSeq).toSeq == want.toSeq)
    assert(jobs.get() == 1, s"expected ONE scan job, saw ${jobs.get()}")
  }
}
