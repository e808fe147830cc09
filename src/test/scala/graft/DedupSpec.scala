package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.ann.Knn
import graft.functions.TextFunctions

/** Dedup / ANN cross-validation: approximate paths (LSH, SimHash)
  * against their exact counterparts on the same corpus.
  */
class DedupSpec extends SparkSpec {

  private def docs = Tables(spark, sf).documents
  private def embs = Tables(spark, sf).embeddings

  test("exact dedup: every doc lands in exactly one group") {
    val groups = Dedup.exact(docs)
    val docsTotal = docs.count()
    val grouped = groups.agg(sum("n_docs")).head.getLong(0)
    assert(grouped == docsTotal)
  }

  test("minhash-LSH pairs are verified-correct and recall high-sim pairs") {
    val lsh = Dedup.minhashLshPairs(docs, k = 3, nBands = 4, rowsPerBand = 4,
      verifyThreshold = 0.6).select("a_id", "b_id")
    val exact = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6,
      blockCols = Seq(lit(1))).select("a_id", "b_id", "jaccard")
    // soundness: every LSH pair is a true pair (post-verification)
    assert(lsh.except(exact.select("a_id", "b_id")).count() == 0)
    // recall: banding (4x4) catches nearly-identical docs (j >= 0.9)
    val hi = exact.filter(col("jaccard") >= 0.9).select("a_id", "b_id")
    val missed = hi.except(lsh).count()
    val total = hi.count()
    assert(total == 0 || missed.toDouble / total <= 0.2,
      s"LSH missed $missed of $total high-sim pairs")
  }

  test("ngram Jaccard: maxDocFreq cap leaves the pair set unchanged at 0.6") {
    // boilerplate shingles alone cannot carry a pair over a real
    // threshold (a dropped shingle sits in both docs' unions too), so
    // capping the degenerate df² keys must not change which pairs
    // survive — only the join cost
    def pairSet(cap: Option[Long]) =
      Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6,
        blockCols = Seq(lit(1)), maxDocFreq = cap)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairSet(None)
    val capped = pairSet(Some(20L))
    assert(uncapped.nonEmpty)
    assert(capped == uncapped,
      s"capped-only: ${capped -- uncapped}; lost: ${uncapped -- capped}")
  }

  test("ngram Jaccard: the cap cannot admit a false positive") {
    import spark.implicits._
    // two docs sharing ONLY a boilerplate phrase (df = 3 via a third
    // doc) and nothing else: true Jaccard is below threshold, and the
    // cap (which only under-counts intersections) must agree
    val boiler = "subscribe to our newsletter for updates today"
    val d = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta"),
      (2L, s"$boiler one two three four five six"),
      (3L, s"$boiler seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    for (cap <- Seq(None, Some(2L))) {
      val got = Dedup.ngramJaccardPairs(d, k = 3, threshold = 0.5,
        blockCols = Seq(lit(1)), maxDocFreq = cap).count()
      assert(got == 0, s"cap $cap admitted a boilerplate-only pair")
    }
  }

  test("dupSpans: cross-doc duplicated 8-gram counts, zero-dup docs kept") {
    import spark.implicits._
    // docs 1 and 2 share a 10-word prefix -> exactly 3 common 8-grams
    // (start positions 0..2); doc 3 shares nothing but must still
    // appear with n_dup = 0 (the signal covers every doc, not just hits)
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (1L, shared + " one two three four five six seven eight"),
      (2L, shared + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
      (3L, "totally different words that never repeat anywhere else in corpus here"))
      .toDF("doc_id", "text")
    val r = Dedup.dupSpans(d, k = 8).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(1L) == ((11L, 3L)))
    assert(r(2L) == ((11L, 3L)))
    assert(r(3L)._2 == 0L)
  }

  test("scrubSpans removes exactly the covered span, keeps the rest") {
    import spark.implicits._
    // docs 1/2 share a 10-word prefix: dup 8-grams start at 0..2, so
    // covered = positions 0..9 — the whole prefix goes, the unique
    // suffix stays verbatim. doc 3 (no dup) must come back intact;
    // doc 4 (< 8 words) has no 8-gram and is untouchable by design.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val suf1 = "one two three four five six seven eight"
    val suf2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val clean = "totally different words that never repeat anywhere else in corpus here"
    val d = Seq(
      (1L, shared + " " + suf1),
      (2L, shared + " " + suf2),
      (3L, clean),
      (4L, "tiny doc four words"))
      .toDF("doc_id", "text")
    val r = Dedup.scrubSpans(d, k = 8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_words"), x.getAs[Long]("n_kept"),
          x.getAs[String]("scrubbed_text")))).toMap
    assert(r(1L) == ((18L, 8L, suf1)))
    assert(r(2L) == ((18L, 8L, suf2)))
    assert(r(3L) == ((11L, 11L, clean)))
    assert(r(4L) == ((4L, 4L, "tiny doc four words")))
  }

  test("scrubSpans covers a within-doc repeated span too") {
    import spark.implicits._
    val span = "p q r s t u v w" // 8 words, repeated inside one doc
    val d = Seq(
      (1L, s"$span unique middle words here $span"),
      (2L, "entirely unrelated filler content that repeats nothing at all"))
      .toDF("doc_id", "text")
    val r = Dedup.scrubSpans(d, k = 8).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_kept"), x.getAs[String]("scrubbed_text")))).toMap
    assert(r(1L) == ((4L, "unique middle words here")))
    assert(r(2L)._1 == 9L)
  }

  test("clusterSample: full coverage, quota behavior, determinism") {
    val embs = Tables(spark, sf).embeddings
    val r = Knn.clusterSample(embs, perCell = 12, nlist = 16).collect()
    assert(r.length == embs.count()) // every vector labeled, none dropped
    // cells at or under quota keep everything (rate saturates at 1e6)
    r.filter(_.getAs[Long]("cell_size") <= 12)
      .foreach(x => assert(x.getAs[Boolean]("kept")))
    // big cells keep roughly the quota — loose binomial band, the
    // threshold is expected-value by design
    val bySize = r.groupBy(_.getAs[Long]("cell"))
    bySize.foreach { case (cell, rows) =>
      val size = rows.head.getAs[Long]("cell_size")
      val kept = rows.count(_.getAs[Boolean]("kept"))
      assert(size == rows.length)
      if (size >= 50) assert(kept >= 2 && kept <= 40,
        s"cell $cell size $size kept $kept")
    }
    val again = Knn.clusterSample(embs, perCell = 12, nlist = 16).collect()
    assert(r.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("simhash pairs have low hamming distance and shared chunks") {
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 3))
  }

  test("simhash of identical token lists is identical") {
    val df = spark.range(2).select(
      Dedup.simhash64(TextFunctions.words(lit("the quick brown fox"))).as("h"))
    val hs = df.collect().map(_.getLong(0)).distinct
    assert(hs.length == 1)
  }

  test("LSH knn results are a subset of brute-force cosine space") {
    val q = embs.filter(col("vec_id") < 10)
    val bf = Knn.bruteForce(embs, q, k = 10).select("q_id", "n_id")
    val lsh = Knn.lshTopK(embs, q, k = 10, nBits = 4)
    // sanity: lsh returns some neighbors and scores are valid cosines
    val rows = lsh.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    // recall vs exact top-10 is expected partial; just require overlap > 0
    assert(lsh.select("q_id", "n_id").intersect(bf).count() > 0)
  }

  test("multi-probe LSH recall >= single-probe recall vs brute force") {
    val q = embs.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(Knn.bruteForce(embs, q, k = 10))
    val single = pairs(Knn.lshTopK(embs, q, k = 10, nBits = 4))
    val multi = pairs(Knn.lshTopKMultiProbe(embs, q, k = 10, nBits = 4))
    val rs = single.intersect(bf).size
    val rm = multi.intersect(bf).size
    // probing the nBits Hamming-1 buckets can only widen the candidate
    // set, so true-top-k recall must not drop (and typically rises)
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    assert(multi.nonEmpty)
  }

  test("IVF knn: deterministic and decent recall vs brute force") {
    val q = embs.filter(col("vec_id") < 10)
    val bf = Knn.bruteForce(embs, q, k = 10).select("q_id", "n_id")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = pairs(Knn.ivfTopK(embs, q, k = 10, nlist = 8, nProbe = 4))
    val ivf2 = pairs(Knn.ivfTopK(embs, q, k = 10, nlist = 8, nProbe = 4))
    // determinism across runs
    assert(ivf1 == ivf2)
    // probing half the cells should recover a good share of true top-k
    val bfSet = pairs(bf.toDF("q_id", "n_id"))
    val hit = ivf1.intersect(bfSet).size
    val total = bfSet.size
    assert(hit.toDouble / total >= 0.3, s"IVF recall $hit/$total")
  }

  test("PQ knn: deterministic, high recall vs brute force after re-rank") {
    val q = embs.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bfSet = pairs(Knn.bruteForce(embs, q, k = 10))
    val pq1 = pairs(Knn.pqTopK(embs, q, k = 10, m = 8, ksub = 32, refine = 6))
    val pq2 = pairs(Knn.pqTopK(embs, q, k = 10, m = 8, ksub = 32, refine = 6))
    // determinism across runs (fixed init, fixed iters, id tiebreaks)
    assert(pq1 == pq2)
    // ADC shortlist + exact re-rank should recover most of true top-k
    val hit = pq1.intersect(bfSet).size
    assert(hit.toDouble / bfSet.size >= 0.5,
      s"PQ recall $hit/${bfSet.size}")
    // every returned cosine is a true cosine (exact re-rank output)
    val withCos = Knn.pqTopK(embs, q, k = 10).collect()
    withCos.foreach { r =>
      val c = r.getAs[Double]("cos")
      assert(c >= -1.0001 && c <= 1.0001)
    }
  }

  test("clusters: every member maps to the component's min id") {
    import spark.implicits._
    // two components: {1,2,3} (chain) and {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: diameter-200 chain converges (pointer doubling)") {
    import spark.implicits._
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // collectThreshold=0 forces the distributed iterative path (the
    // driver union-find would otherwise absorb a 200-edge graph)
    val got = Dedup.clusters(pairs, collectThreshold = 0L)
    assert(got.filter(col("cluster_id") =!= 1L).count() == 0)
    assert(got.count() == 200)
  }

  test("clusters: both paths emit long ids for IntegerType input") {
    import spark.implicits._
    // regression: the driver union-find always returned LongType but
    // the distributed path used to keep IntegerType, so the output
    // schema depended on which side of collectThreshold the edge
    // count fell
    val pairs = Seq((1, 2), (2, 3)).toDF("a_id", "b_id") // IntegerType
    val fast = Dedup.clusters(pairs)
    val dist = Dedup.clusters(pairs, collectThreshold = 0L)
    assert(fast.schema == dist.schema, s"${fast.schema} vs ${dist.schema}")
    assert(fast.schema.forall(_.dataType ==
      org.apache.spark.sql.types.LongType))
    assert(fast.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      dist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("clusters: driver union-find and iterative paths agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random sparse graph + a long chain + an isolated pair
    val pairs = ((1L until 60L).map(i => (i, i + 1)) ++
      (0 until 80).map(_ => (rnd.nextInt(100).toLong + 200L,
        rnd.nextInt(100).toLong + 200L)).filter(p => p._1 != p._2) ++
      Seq((1000L, 1001L))).toDF("a_id", "b_id")
    val fast = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iter = Dedup.clusters(pairs, collectThreshold = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == iter)
  }

  test("IVF knn accepts array<double> embeddings") {
    val embsD = embs.withColumn("embedding", col("embedding").cast("array<double>"))
    val q = embsD.filter(col("vec_id") < 3)
    assert(Knn.ivfTopK(embsD, q, k = 5, nlist = 4, nProbe = 2).count() > 0)
  }

  test("full dedup pipeline keeps one canonical doc per cluster") {
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.6,
      blockCols = Seq(col("lang")))
    val clusters = Dedup.clusters(pairs)
    val nonCanonical = clusters.filter(col("doc_id") =!= col("cluster_id"))
    val kept = docs.join(nonCanonical, Seq("doc_id"), "left_anti")
    assert(kept.count() == docs.count() - nonCanonical.count())
    // canonical docs themselves are kept
    val canon = clusters.select(col("cluster_id").as("doc_id")).distinct()
    assert(canon.join(kept, Seq("doc_id"), "left_semi").count() == canon.count())
  }

  test("embedding near-dup pairs are symmetric-free (a < b) and above threshold") {
    val pairs = Dedup.embeddingPairs(embs, 0.35, col("label")).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
      assert(r.getAs[Double]("cos") >= 0.35 - 1e-9)
    }
  }

  test("embedding decontamination flags planted semantic contamination only") {
    import spark.implicits._
    val bench = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (100L, Array(0.99f, 0.01f, 0.0f, 0.0f)), // ~bench 1 (paraphrase)
      (101L, Array(0.0f, 0.0f, 1.0f, 0.0f)),   // orthogonal — clean
      (102L, Array(0.6f, 0.6f, 0.0f, 0.0f)))   // between both benches
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingDecontaminate(corpus, bench, tau = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Long]("bench_id")).toMap
    assert(got.contains(100L) && got(100L) == 1L)
    assert(!got.contains(101L))
    assert(!got.contains(102L)) // cos = 0.707 < 0.9 to either bench
    // lowering tau flags the in-between doc; its best match is still one row
    val loose = Dedup.embeddingDecontaminate(corpus, bench, tau = 0.5)
      .collect().map(r => r.getAs[Long]("vec_id")).toSeq
    assert(loose.count(_ == 102L) == 1)
  }

  test("semdedup: complete, one keeper per cell, drop bound, deterministic") {
    val tau = 0.95
    val run1 = Knn.semDedup(embs, tau = tau, nlist = 8).collect()
    // every vector classified exactly once
    assert(run1.length == embs.count())
    assert(run1.map(_.getAs[Long]("vec_id")).toSet.size == run1.length)
    val byCell = run1.groupBy(_.getAs[Long]("cell"))
    byCell.foreach { case (_, rows) =>
      // exactly one keeper per cell; the keeper is kept
      val keeperIds = rows.map(_.getAs[Long]("keeper_id")).toSet
      assert(keeperIds.size == 1)
      val keeperRow = rows.find(r =>
        r.getAs[Long]("vec_id") == keeperIds.head).get
      assert(keeperRow.getAs[Boolean]("kept"))
      // a dropped member is semantically redundant vs the keeper
      rows.filter(!_.getAs[Boolean]("kept")).foreach { r =>
        assert(r.getAs[Double]("cos_keeper") >= tau - 1e-9)
      }
      // a kept non-keeper is below the redundancy bar
      rows.filter(r => r.getAs[Boolean]("kept") &&
          r.getAs[Long]("vec_id") != keeperIds.head).foreach { r =>
        assert(r.getAs[Double]("cos_keeper") < tau + 1e-9)
      }
    }
    val run2 = Knn.semDedup(embs, tau = tau, nlist = 8).collect()
    assert(run1.map(_.toString).sorted.sameElements(run2.map(_.toString).sorted))
  }

  test("semdedup drops a planted semantic duplicate, keeps distinct vectors") {
    import spark.implicits._
    // three tight groups in R^4 plus one exact-duplicate pair; nlist=3
    // cells separate the groups, the duplicate collapses onto its keeper
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.01f, 0.0f)), // ~same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.01f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(0.01f, 0.0f, 1.0f, 0.0f))) // ~same direction as 4
      .toDF("vec_id", "embedding")
    val got = Knn.semDedup(vecs, tau = 0.99, nlist = 3, trainSample = 5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept"))
      .toMap
    // each planted near-dup pair loses exactly its non-keeper member
    assert(got.count(!_._2) == 2)
    assert(!got(2L) || !got(1L))
    assert(!got(5L) || !got(4L))
    assert(got(3L))
  }

  test("incremental dedup classifies a delta against base and within batch") {
    val srcnum = regexp_extract(col("source"), "[0-9]+", 0).cast("int")
    val out = Dedup.incremental(
      docs.where(srcnum < 15), docs.where(srcnum >= 15))
    // every incoming doc classified exactly once
    assert(out.count() == docs.where(srcnum >= 15).count())
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // counts independently derived (DuckDB over the same parquet):
    // 13 word-set collisions against the base snapshot, 2 within the
    // delta, 110 genuinely new
    assert(byStatus == Map(
      "dup_vs_base" -> 13L, "dup_in_batch" -> 2L, "kept" -> 110L), byStatus)
    // a doc flagged dup_in_batch must share its fingerprint with a
    // smaller incoming doc_id that was kept or also in base
    val inc = docs.where(srcnum >= 15)
      .select(col("doc_id"), Dedup.wordSetFp(col("text")).as("fp"))
    val flagged = out.where(col("status") === "dup_in_batch")
      .join(inc, "doc_id")
    val earlier = flagged.as("f").join(inc.as("i"),
      col("i.fp") === col("f.fp") && col("i.doc_id") < col("f.doc_id"))
    assert(earlier.count() >= flagged.count())
  }
}
