package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the LLM-data-pipeline surface.
  *
  * Scale notes (these run over 100 TB corpora):
  *  - exact: one shuffle on the 128-bit content hash; never on raw text.
  *  - ngramJaccardPairs: candidate pairs are generated ONLY within
  *    blocking buckets (never a global cross join); bucket size is
  *    bounded by construction (lang × length band).
  *  - minhashLsh: the classic shingle → minhash → band-bucket →
  *    bucket-join pipeline; the only shuffle keys are (band, bandHash),
  *    and oversized buckets (degenerate content) are capped.
  *  - simhash: 64-bit signature; candidate pairs via 16-bit chunk
  *    blocking (any pair within Hamming distance 3 shares ≥1 of 4
  *    exact chunks — pigeonhole), then exact Hamming verify.
  */
object Dedup {

  /** Fan the (often few/unsplittable) input files out across the
    * cluster before per-document heavy compute (normalize, shingle,
    * hash). The shuffle moves raw text once; every downstream stage
    * then runs at full parallelism instead of one task per input
    * file. At 100 TB the input is usually already well-split, but a
    * repartition keyed on the doc id stays correct and cheap relative
    * to the compute it unlocks.
    */
  private def fanOut(docs: DataFrame, idCol: String): DataFrame =
    // explicit partition count: AQE would otherwise coalesce the
    // byte-small (but compute-heavy) text rows back into one task
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
      col(idCol))

  /** Exact dedup on normalized content hash: canonical id = min doc id
    * per group (deterministic survivor pick).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    fanOut(docs, idCol)
      .select(md5(normalize(col(textCol))).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Word-SET fingerprint: order- and multiplicity-insensitive content
    * key (the "aggressive normalization" pass between crawl
    * snapshots) — sorted distinct words, 128-bit hashed so the
    * shuffle never carries raw text.
    */
  private[graft] def wordSetFp(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), ","))

  /** Incremental (snapshot-vs-snapshot) dedup: flag each INCOMING
    * document against an existing BASE corpus and against earlier
    * arrivals of its own batch, on [[wordSetFp]]. This is the
    * continuous-crawl shape: the base never re-deduplicates; only the
    * delta is classified.
    *
    * Returns one row per incoming doc: (idCol, status) with status ∈
    * dup_vs_base | dup_in_batch | kept (first occurrence by idCol
    * wins within the batch; membership in the base dominates).
    *
    * Scale shape at 100 TB: the base reduces to DISTINCT fingerprints
    * once — in production you persist that as a bucketed fingerprint
    * table keyed on fp and never rescan base text per delta. The
    * incoming batch (orders of magnitude smaller than the base)
    * shuffles ONCE on fp, and both the first-occurrence window and
    * the left join against base fps reuse that same hash
    * partitioning; base text never moves.
    */
  def incremental(base: DataFrame, incoming: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val baseFp = base.select(wordSetFp(col(textCol)).as("fp"))
      .distinct()
      .withColumn("in_base", lit(true))
    val inc = fanOut(incoming, idCol)
      .select(col(idCol), wordSetFp(col(textCol)).as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy(col(idCol))
    inc.withColumn("rn", row_number().over(w))
      .join(baseFp, Seq("fp"), "left")
      .select(col(idCol),
        when(col("in_base"), "dup_vs_base")
          .when(col("rn") > 1, "dup_in_batch")
          .otherwise("kept").as("status"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * word-k-gram with an evaluation/benchmark set — the train/test
    * overlap scrub every serious pretraining pipeline runs (the
    * GPT-3-style n-gram collision check).
    *
    * The benchmark side is SMALL by nature (eval sets are thousands
    * of documents, the corpus is billions), so its exploded gram
    * postings are `broadcast()`: the corpus side streams through a
    * broadcast-hash join with NO shuffle of corpus data at all; the
    * only exchange is the per-doc aggregation of matched grams —
    * keyed on doc_id (high-cardinality) and already reduced to hit
    * rows by the join. At 100 TB that is the difference between a
    * map-side pass and re-shuffling the corpus.
    *
    * Returns one row per contaminated corpus doc: how many of its
    * distinct k-grams hit the benchmark, its total distinct k-grams,
    * the contamination ratio, and how many distinct benchmark docs it
    * collides with.
    */
  /** The benchmark's distinct k-gram FNV-1a hashes as a sorted
    * driver-side array — the pre-fit "model" of the s29/pipe1
    * row-local contamination probe ([[graft.functions.GramSetHits]]).
    * Eval sets are small by NATURE, but that is an assumption, not an
    * invariant: the limit(cap+1) probe bounds driver memory in the
    * same single job and fails loudly over the cap (~80 MB of longs
    * at the 10M default), pointing at the distributed
    * [[decontaminate]] join as the over-cap operator.
    */
  def benchGramHashes(
      benchmark: DataFrame,
      k: Int,
      cap: Int = 10000000,
      textCol: String = "text"): Array[Long] = {
    val grams = benchmark
      .select(explode(shingles(col(textCol), k)).as("gram"))
      .select(graft.functions.Fnv64(col("gram")).as("g"))
      .distinct()
    val probed = grams.limit(cap + 1).collect()
    require(probed.length <= cap,
      s"benchGramHashes: benchmark gram set exceeds $cap distinct " +
        "grams — too large for a driver-side broadcast probe; use the " +
        "distributed d6 decontamination join instead")
    probed.map(_.getLong(0)).sorted
  }

  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // (gram, benchmark doc) postings; shingles() is per-doc distinct
    val benchGrams = benchmark.select(
      col(idCol).as("bench_id"),
      explode(shingles(col(textCol), k)).as("gram"))
    val corpusGrams = fanOut(corpus, idCol)
      .select(col(idCol), shingles(col(textCol), k).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_grams"),
        explode(col("sh")).as("gram"))
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(
        countDistinct(col("gram")).as("n_hit_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
      .select(
        col(idCol),
        col("n_hit_grams"),
        col("n_grams").cast("long").as("n_grams"),
        round(col("n_hit_grams").cast("double") /
          greatest(col("n_grams").cast("double"), lit(1.0)), 6)
          .as("contamination"),
        col("n_bench_docs"))
  }

  /** Cross-document duplicated-span fraction: for every document, the
    * share of its distinct word-k-grams that also occur in at least
    * one OTHER document — the exact-substring duplication signal
    * (at n-gram granularity) that training-data pipelines use to
    * find boilerplate and templated text that near-dup DOC-level
    * methods miss (a doc can be 30% duplicated without any single
    * near-duplicate partner).
    *
    * Plan: explode per-doc distinct shingles, hash each gram to a
    * 64-bit FNV-1a key (the exchange carries 8-byte keys, never gram
    * strings), aggregate document frequency per gram, join back and
    * count per doc. Two high-cardinality shuffles (gram hash, then
    * doc id) — no pair enumeration anywhere, so cost is linear in
    * total grams. Degenerate boilerplate grams concentrate postings
    * on one key; AQE's skew-join split bounds that at cluster scale.
    */
  def dupSpans(
      docs: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    import graft.functions.Fnv64
    val grams = fanOut(docs, idCol)
      .select(col(idCol), shingles(col(textCol), k).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_grams"),
        explode(col("sh")).as("gram"))
      .select(col(idCol), col("n_grams"), Fnv64(col("gram")).as("g"))
    // per-gram document frequency (shingles are per-doc distinct, so
    // count(*) IS the doc count)
    val freq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams.join(freq, Seq("g"))
      .groupBy(col(idCol), col("n_grams"))
      .agg(sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(
        col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        col("n_dup"),
        round(col("n_dup").cast("double") /
          greatest(col("n_grams").cast("double"), lit(1.0)), 6)
          .as("dup_frac"))
  }

  /** Substring-level span SCRUBBING (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", at word-k-gram
    * granularity): remove from every document the word positions
    * covered by any k-gram that occurs ≥2 times in the corpus, and
    * emit the surviving text. Where [[dupSpans]] measures the dup
    * fraction, this actually produces the cleaned corpus — the
    * suffix-array scrub re-expressed relationally so it distributes.
    *
    * Plan: positional k-grams (native [[graft.functions.PositionalShingles]],
    * one pass) → occurrence count per 8-byte FNV gram key (shuffle 1,
    * never gram strings) → dup starts join (shuffle 2) → covered
    * positions by exploding each start to its k offsets (linear,
    * ≤ k × grams rows) → anti-join the positional words (shuffle on
    * (doc, pos)) → per-doc ordered rebuild. Every exchange key is
    * high-cardinality; no pair enumeration, no per-doc quadratic walk.
    * Output text is over NORMALIZED words (the dedup token space) —
    * the pipeline position for this operator is pre-tokenization.
    */
  def scrubSpans(
      docs: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      passthrough: Seq[String] = Nil): DataFrame = {
    import graft.functions.{Fnv64, PositionalShingles}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val base = fanOut(docs, idCol)
      .select(col(idCol) +: passthrough.map(col) :+
        words(col(textCol)).as("w"): _*)
      .withColumn("nw", size(col("w")))
    val grams = base.select(col(idCol),
      posexplode(ColumnBridge.column(PositionalShingles(
        ColumnBridge.expression(col("w")), k))))
      .select(col(idCol), col("pos"), Fnv64(col("col")).as("g"))
    val freq = grams.groupBy("g").agg(count(lit(1)).as("cnt"))
    val dupStarts = grams.join(freq, Seq("g")).where(col("cnt") >= 2)
      .select(col(idCol), col("pos"))
    // per-doc dup-start list (small — only duplicated grams), then ONE
    // row-local O(n + |starts|·k) rebuild (native ScrubWords). The
    // first formulation posexploded every word, anti-joined exploded
    // covered offsets on (doc, pos) and re-sorted a collect_list —
    // two extra corpus-sized exchanges plus a per-doc sort that this
    // expression replaces (4.4s → ~half at sf0.1).
    val starts = dupStarts.groupBy(col(idCol).as("did"))
      .agg(collect_list(col("pos").cast("long")).as("starts"))
    val sc = ColumnBridge.column(graft.functions.ScrubWords(
      ColumnBridge.expression(col("w")),
      ColumnBridge.expression(
        coalesce(col("starts"), expr("array()").cast("array<bigint>"))),
      k))
    base.join(starts, col(idCol) === col("did"), "left")
      .select(col(idCol) +: passthrough.map(col) :+ col("nw") :+
        sc.as("sc"): _*)
      .select(col(idCol) +: passthrough.map(col) :+
        col("nw").cast("long").as("n_words") :+
        col("sc.n_kept").as("n_kept") :+
        col("sc.txt").as("scrubbed_text"): _*)
  }

  /** Near-dup pairs by exact word-k-gram Jaccard within blocking
    * buckets. Jaccard = |A∩B| / |A∪B| over distinct shingles.
    *
    * Inverted-index plan, NOT a quadratic pair join: explode each
    * doc's distinct shingles into postings, equi-join postings on
    * (shingle, block) to enumerate shared-shingle occurrences, then
    * a single count per (a,b) IS |A∩B|; |A∪B| = |A| + |B| − |A∩B|.
    * Pairs with an empty intersection can never reach a positive
    * threshold, so dropping them is exact.
    *
    * Cost is Σ_shingle freq² (912k at sf0.1) instead of Σ_block n²
    * (2.9M pairs × array-hash work) — and the shuffle keys (shingle,
    * then pair id) are high-cardinality, so a 1000-executor cluster
    * actually fans out; blocking-key cardinality no longer caps
    * parallelism. Degenerate boilerplate shingles bound the skew at
    * max-doc-frequency²; `maxDocFreq` caps them: postings whose
    * shingle occurs in more than that many docs are dropped BEFORE
    * the pair join, cutting the df² hot keys. The cap only ever
    * UNDER-counts intersections (sizes stay full), so it can drop
    * borderline pairs but never admit a false positive — and
    * boilerplate shingles alone cannot carry a pair over a real
    * threshold (each dropped shingle is in both docs' unions too).
    * None (the default) changes nothing.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      k: Int,
      threshold: Double,
      blockCols: Seq[Column],
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDocFreq: Option[Long] = None): DataFrame = {
    val blockNames = blockCols.indices.map(i => s"blk$i")
    val base = fanOut(docs, idCol).select(
      (col(idCol) +: shingles(col(textCol), k).as("sh") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }): _*)
      .withColumn("n", size(col("sh")))
    val postings0 = base.select(
      (col(idCol) +: col("n") +: explode(col("sh")).as("s") +:
        blockNames.map(col)): _*)
    val postings = maxDocFreq match {
      case Some(cap) =>
        // per-shingle doc frequency (shingles are per-doc distinct, so
        // count(*) is the doc count); the df join shuffles on the same
        // key as the pair join below, and pruning happens before the
        // df² fan-out ever materializes
        val df = postings0.groupBy("s").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).drop("__df")
        postings0.join(df, Seq("s"))
      case None => postings0
    }
    val a = postings.select((col("s") +: col(idCol).as("a_id") +:
      col("n").as("a_n") +: blockNames.map(col)): _*)
    val b = postings.select((col("s") +: col(idCol).as("b_id") +:
      col("n").as("b_n") +: blockNames.map(col)): _*)
    val shared = a.join(b, Seq("s") ++ blockNames)
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_n", "b_n")
      .agg(count(lit(1)).as("inter"))
    shared
      .withColumn("jaccard", col("inter").cast("double") /
        (col("a_n") + col("b_n") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signature: ONE native pass over the shingle array
    * updating all nHashes minima (see [[graft.functions.MinHashUtil]]).
    * The previous `array_min(transform(sh, xxhash64(s, seed)))`-per-
    * seed formulation walked the array nHashes times through
    * interpreted HOF lambdas (HOFs are excluded from whole-stage
    * codegen) and dominated d3's wall time.
    */
  def minhashSig(sh: Column, nHashes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(sh), nHashes))
  }

  /** MinHash + LSH near-dup candidate pairs, verified by exact
    * Jaccard. nBands × rowsPerBand = signature length; a pair is a
    * candidate iff some band of the signature matches exactly.
    */
  def minhashLshPairs(
      docs: DataFrame,
      k: Int,
      nBands: Int,
      rowsPerBand: Int,
      verifyThreshold: Double,
      maxBucket: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val nH = nBands * rowsPerBand
    // cached because it is consumed THREE times — by the signature
    // pipeline and by the two candidate re-attachment joins below;
    // without it each consumer re-reads parquet, re-normalizes, and
    // re-shingles the corpus. persist(MEMORY_AND_DISK), not
    // localCheckpoint: lazy (no extra job at build time), spills
    // instead of failing when shingles outgrow executor memory, and
    // survives executor loss by lineage recompute — all three matter
    // at 100 TB where the shingle arrays are larger than the input
    // text. The cache is released by Spark's ContextCleaner once the
    // query's frames are unreachable (one bench/verify job per query),
    // so no explicit unpersist hook is threaded through the caller.
    val shingled = fanOut(docs, idCol)
      .select(col(idCol), shingles(col(textCol), k).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = shingled.withColumn("sig", minhashSig(col("sh"), nH))
    // explode into (band, bandKey) — shuffle key is the band bucket.
    // The shingle arrays are NOT carried through the band shuffle or
    // the candidate distinct: they are functionally determined by the
    // id, and hashing/exchanging them would multiply shuffle bytes by
    // the per-doc shingle size. They are re-attached (one cheap
    // re-shingle scan, no minhash) only for the surviving candidates.
    val banded = base.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)), b =>
        concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    // cap degenerate buckets (e.g. empty/boilerplate docs) to bound skew
    val bucketed = banded
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_key")))
      .filter(col("__bn") <= maxBucket)
    val a = bucketed.select(col("band"), col("band_key"), col(idCol).as("a_id"))
    val b = bucketed.select(col("band"), col("band_key"), col(idCol).as("b_id"))
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val withSh = cand
      .join(shingled.select(col(idCol).as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(shingled.select(col(idCol).as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
    val inter = size(array_intersect(col("a_sh"), col("b_sh"))).cast("double")
    val uni = size(array_union(col("a_sh"), col("b_sh"))).cast("double")
    withSh.withColumn("jaccard", inter / uni)
      .filter(col("jaccard") >= verifyThreshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** 64-bit SimHash from word tokens: bit j of the signature is the
    * sign of Σ_tokens (bit j of hash(token) ? +1 : −1). Single-pass
    * native Catalyst expression (see [[graft.functions.SimHashUtil]]).
    */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.SimHash64(
      ColumnBridge.expression(tokens)))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (< 16),
    * candidates via 16-bit chunk blocking.
    */
  def simhashPairs(
      docs: DataFrame,
      maxHamming: Int,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(maxHamming < 4, "chunk blocking assumes maxHamming ≤ 3 over 4 chunks")
    val base = fanOut(docs, idCol).select(col(idCol),
      simhash64(words(col(textCol))).as("sh64"))
    val chunked = base.select(col(idCol), col("sh64"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sh64"), c * 16).bitwiseAND(0xffffL)): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("a_id"), col("sh64").as("a_sh"))
    val b = chunked.select(col("chunk"), col("chunk_val"),
      col(idCol).as("b_id"), col("sh64").as("b_sh"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh").distinct()
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Connected components over near-dup pairs → dedup clusters: every
    * doc in a cluster maps to the cluster's minimum doc id (the
    * canonical survivor). Iterative min-label propagation with
    * pointer doubling: each round takes the min over (a) neighbours'
    * labels (one equi-join + groupBy-min on the edge list) and (b)
    * the label's own label (one self-join — the "shortcut" step), so
    * convergence is O(log component-diameter) rounds rather than
    * O(diameter); long near-dup chains (common in web corpora)
    * converge in a handful of rounds. `localCheckpoint` truncates the
    * growing lineage each round. Shuffle-friendly throughout — the
    * join keys are node ids, no driver-side graph.
    *
    * Throws if maxIters rounds pass without reaching the fixpoint
    * (2^50-diameter components would be required at the default) —
    * a silent early exit would split a cluster with no warning.
    */
  def clusters(
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIters: Int = 50, collectThreshold: Long = 4000000L): DataFrame = {
    // Near-dup pair sets are SMALL relative to the corpus (the pair
    // generators upstream already bucketed and thresholded); below
    // `collectThreshold` edges the components are solved with one
    // driver-side union-find pass — the same bounded-collect class as
    // the IVF quantizer's sample (a 4M-edge list is ~64 MB, broadcast-
    // join scale), and it replaces ~4 Spark jobs × O(log diameter)
    // rounds of fixed scheduling cost with one job. `limit(T+1)`
    // makes the size probe and the fetch a single execution of the
    // (expensive) upstream pair pipeline: if the driver got ≤ T rows,
    // it got ALL of them. Beyond the threshold the iterative
    // pointer-doubling path below runs — shuffle-keyed on node ids,
    // no driver-side graph, the 100 TB shape.
    val sess = pairs.sparkSession
    require(collectThreshold < Int.MaxValue,
      s"clusters: collectThreshold must stay below Int.MaxValue " +
        s"(limit() takes an Int); got $collectThreshold")
    val integralIds = Seq(aCol, bCol).forall { c =>
      pairs.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => true
        case _ => false
      }
    }
    val probe: Array[org.apache.spark.sql.Row] =
      if (!integralIds) Array.empty
      else pairs
        .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
        .limit((collectThreshold + 1).toInt).collect()
    if (integralIds && probe.length <= collectThreshold) {
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) {
          val nxt = parent.getOrElse(c, c); parent(c) = r; c = nxt
        }
        r
      }
      probe.foreach { e =>
        val (ru, rv) = (find(e.getLong(0)), find(e.getLong(1)))
        // union by MIN root: the canonical survivor is the min doc id
        if (ru < rv) parent(rv) = ru else if (rv < ru) parent(ru) = rv
        else { parent.getOrElseUpdate(ru, ru); () }
      }
      val nodes = probe.iterator
        .flatMap(e => Iterator(e.getLong(0), e.getLong(1))).toSet
      import sess.implicits._
      return nodes.toSeq.sorted.map(n => (n, find(n)))
        .toDF("doc_id", "cluster_id")
    }
    // both edge directions from ONE pass over `pairs` — a
    // select-union would execute the (expensive) upstream pair
    // pipeline twice, once per branch
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("u"), col(bCol).as("v")),
        struct(col(bCol).as("u"), col(aCol).as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val prop = edges
        .join(labels, edges("v") === labels("node"))
        .groupBy(edges("u").as("n2")).agg(min("label").as("nbr"))
      // materialized because it is consumed TWICE below — as the left
      // side of the pointer-doubling join and (via byNode) as its
      // right side; without this the neighbour-propagation join+agg
      // above re-executes per consumer, doubling every round's work
      val viaNbr = labels.join(prop, labels("node") === prop("n2"), "left")
        .select(labels("node"),
          least(labels("label"), coalesce(col("nbr"), labels("label")))
            .as("label"),
          labels("label").as("prev"))
        .localCheckpoint()
      // pointer doubling: label ← min(label, label(label)). The prev
      // label rides along so change detection is a filter over the
      // checkpointed result, not an extra join against the old labels.
      val byNode = viaNbr.select(col("node").as("pn"), col("label").as("pl"))
      val next = viaNbr.join(byNode, viaNbr("label") === col("pn"), "left")
        .select(viaNbr("node"),
          least(viaNbr("label"), coalesce(col("pl"), viaNbr("label")))
            .as("label"),
          viaNbr("prev"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.drop("prev")
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"dedup clusters: min-label propagation did not converge in " +
          s"$maxIters rounds (components would be split) — raise maxIters")
    // long ids when ids are integral: the driver union-find above
    // always emits LongType, so the distributed path must not leak a
    // narrower IntegerType (the two paths would otherwise differ in
    // output schema depending on edge count). Non-integral ids (e.g.
    // strings) only ever take this path, so they keep their type.
    val out = labels.select(col("node").as("doc_id"),
      col("label").as("cluster_id"))
    if (integralIds)
      out.select(col("doc_id").cast("long").as("doc_id"),
        col("cluster_id").cast("long").as("cluster_id"))
    else out
  }

  /** Embedding-cosine near-dup pairs within blocking buckets. Norms
    * are computed once per vector before the pair join (a per-pair
    * norm recompute would triple the fold work).
    *
    * Scale contract: work is quadratic IN THE BLOCK, linear in the
    * number of blocks — one shuffle on the blocking column, pairs
    * formed within partitions. Sound at 100 TB exactly when per-block
    * cardinality is bounded (label/domain/shard blocking); for a
    * corpus whose blocks grow with it, the sub-quadratic paths are
    * LSH bucketing ([[graft.ann.Knn.lshTopK]] shape, v3/v5) or
    * SemDeDup cluster bucketing ([[graft.ann.Knn]], v7) — the same
    * exact-vs-bucketed trade the reference documents for near-dup.
    */
  def embeddingPairs(
      embs: DataFrame,
      threshold: Double,
      blockCol: Column,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorFunctions._
    val base = fanOut(embs, idCol)
      .select(col(idCol), col(vecCol).as("v"), blockCol.as("blk"))
      .withColumn("nrm", norm(col("v")))
    val a = base.select(col("blk"), col(idCol).as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"))
    val b = base.select(col("blk"), col(idCol).as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"))
    a.join(b, Seq("blk"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-space benchmark decontamination: flag corpus vectors
    * whose cosine to ANY benchmark vector reaches `tau` — the
    * semantic complement of [[decontaminate]]'s n-gram overlap scrub
    * (a paraphrased eval question shares no 8-gram but sits right on
    * top of the benchmark in embedding space).
    *
    * Same scale shape as the n-gram path: eval sets are SMALL by
    * nature, so the benchmark side broadcasts (norms precomputed
    * once) and the corpus NEVER shuffles for the match — each corpus
    * row scores |benchmark| dot products map-side, the `tau` filter
    * drops the overwhelming majority, and only flagged rows reach the
    * tiny per-vector argmax aggregate. Emits (vec_id, bench_id, cos)
    * for the best-matching benchmark vector (ties to the lowest id).
    */
  def embeddingDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      tau: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    import graft.functions.VectorFunctions._
    val c = fanOut(corpus, idCol)
      .select(col(idCol).as("vec_id"), col(vecCol).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val b = benchmark
      .select(col(idCol).as("bench_id"), col(vecCol).as("b_v"))
      .withColumn("b_n", norm(col("b_v")))
    c.crossJoin(broadcast(b))
      .withColumn("cos", dot(col("c_v"), col("b_v")) / (col("c_n") * col("b_n")))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cos"), col("bench_id")),
        struct(col("cos"), -col("bench_id"))).as("m"))
      .select(col("vec_id"), col("m.bench_id").as("bench_id"),
        round(col("m.cos"), 6).as("cos"))
  }
}
