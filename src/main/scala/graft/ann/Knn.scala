package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForce]]: exact cosine top-k. The query set is broadcast,
  *    the corpus is scanned once; ranking shuffles only (query_id,
  *    cosine) pairs, pruned to k per query via window rank. This is
  *    the gold baseline and is linear in |corpus| × |queries|.
  *  - [[lshTopK]]: the scale path — random-hyperplane signatures
  *    bucket the corpus; each query searches only its own bucket
  *    (plus Hamming-adjacent probes would be the next refinement).
  *    Sub-linear work per query at the cost of recall, exactly the
  *    IVF/LSH trade the reference surface calls for.
  */
object Knn {

  private def dotArr(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Driver-side Lloyd for the coarse quantizer (shared by [[ivfTopK]]
    * and [[pqTopK]]'s IVF stage): scoring is dot / centroid norm —
    * the row norm is constant per row, so the argmax matches cosine —
    * ties to the lowest cell, empty cells keep their centroid.
    * Deterministic: first-nlist init, fixed iterations.
    */
  /** Deterministic driver-side quantizer training sample over a
    * (n_id: long, n_v: array<float|double>) projection: the n
    * smallest rows by (xxhash64(n_id), n_id) — hash order keeps the
    * sample spread across the corpus (an id-prefix sample is biased
    * whenever ids track content), the id tiebreaker keeps it
    * reproducible, and the usual training floor is n >= ~39*nlist
    * (Lloyd stability rule of thumb).
    *
    * Planned as ONE corpus scan: a hash-range FILTER at a fixed 1/64
    * of the hash space feeds TakeOrderedAndProject, so the top-n heap
    * only ever sees the filtered trickle (expected N/64 rows), never
    * the full corpus — and the n smallest of a hash-PREFIX are the n
    * smallest overall whenever at least n rows pass, so the result is
    * BIT-IDENTICAL to the plain top-K formulation. Fewer than n
    * admitted (corpus under ~64n rows — small by construction) falls
    * back to the full top-K, where the second scan is over a corpus
    * tiny enough not to matter. An earlier version sized the
    * threshold from count() (an extra corpus pass on non-parquet
    * inputs) and re-sorted driver-side through java Comparable, whose
    * UTF-16 String order diverges from the engine's UTF8String binary
    * order on supplementary-character ties; both paths now leave the
    * (hash, id) ordering entirely to the engine.
    */
  private[graft] def hashTrainSample(c: DataFrame, n: Int): Array[Array[Double]] = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val elemIsFloat = c.schema("n_v").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    def toVec(r: org.apache.spark.sql.Row): Array[Double] =
      if (elemIsFloat) r.getSeq[Float](1).map(_.toDouble).toArray
      else r.getSeq[Double](1).toArray
    val proj = c.select(col("n_id"), col("n_v"),
      xxhash64(col("n_id")).as("__h"))
    val threshold = Long.MinValue + (1L << 58) // 2^58 / 2^64 = 1/64
    val got = proj.where(col("__h") < threshold)
      .orderBy(col("__h"), col("n_id")).limit(n).collect()
    val rows =
      if (got.length >= n) got
      else proj.orderBy(col("__h"), col("n_id")).limit(n).collect()
    rows.map(toVec)
  }

  private def trainCoarse(
      sample: Array[Array[Double]], nlist: Int, iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = sample.take(nlist).map(_.clone())
    val dim = sample.head.length
    for (_ <- 1 to iters) {
      val norms = cents.map(cv => math.sqrt(dotArr(cv, cv)) max 1e-300)
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        var best = 0; var bs = Double.NegativeInfinity
        var cell = 0
        while (cell < cents.length) {
          val s = dotArr(v, cents(cell)) / norms(cell)
          if (s > bs) { bs = s; best = cell }
          cell += 1
        }
        counts(best) += 1
        var i = 0; while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.zipWithIndex.map { case (old, cell) =>
        if (counts(cell) == 0) old // empty cells keep their centroid
        else sums(cell).map(_ / counts(cell))
      }
    }
    cents
  }

  /** A vector's nProbe best coarse cells (score desc, ties to the
    * lower cell id) as ONE native codegen'd expression — the earlier
    * literal struct-array-per-centroid formulation cost ~nlist
    * expression subtrees per call site, and its fixed
    * analyze/optimize/Janino overhead dominated the whole query on
    * any corpus size (see [[graft.functions.PqOpsUtil]]).
    */
  private def cellProbesCol(cents: Array[Array[Double]], nProbe: Int)(
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.CellProbes(
      ColumnBridge.expression(v), cents, nProbe))
  }

  def bruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // norms once per vector, not once per (query, vector) pair; fan
    // the corpus out of its (possibly single-file) scan partitioning
    // so the broadcast-probe side scores in parallel
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val c = corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
      .withColumn("n_n", norm(col("n_v")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w = W.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    * corpus into nlist cells; a query probes only its nProbe nearest
    * cells. Deterministic throughout — centroid init is the first
    * nlist sample vectors by id, fixed Lloyd iterations, ties broken
    * by cluster id — so results reproduce across runs/executors.
    *
    * Scale: the coarse quantizer is trained DRIVER-SIDE on a bounded
    * deterministic sample (first trainSample vectors by id) — the
    * standard IVF recipe: quantizer quality needs a representative
    * sample, not the full corpus, and training locally removes
    * 2·iters distributed jobs. The corpus then takes ONE distributed
    * assignment pass where each per-cell similarity is a
    * literal-argument dot product and the argmax an array_max over
    * (score, −cell) structs — row-local, codegen'd, no crossJoin, no
    * shuffle, no window sort. Search broadcasts (queries × probed
    * cells) against the corpus bucketed by cell id, so each query
    * scans |corpus|/nlist × nProbe vectors instead of everything.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      trainSample: Int = 4096): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
    // vecCol may be array<float> (raw embeddings) or array<double>
    // (anything cast upstream) — branch like DotProduct does.
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val elemIsFloat = c.schema("n_v").dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val sample: Array[Array[Double]] = hashTrainSample(c, trainSample)
    require(sample.nonEmpty, "ivfTopK: empty corpus")

    val cents = trainCoarse(sample, nlist, iters)

    val bucketed = c
      .withColumn("cell", element_at(cellProbesCol(cents, 1)(col("n_v")), 1))
      .withColumn("n_n", norm(col("n_v")))
    // query → its nProbe best cells (still row-local; no
    // crossJoin/window — one native expression + explode)
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .select(col("q_id"), col("q_v"),
        explode(cellProbesCol(cents, nProbe)(col("q_v"))).as("cell"))
      .withColumn("q_n", norm(col("q_v")))
    val scored = bucketed.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w = W.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** IVF-PQ product quantization ANN — the memory-bound 100 TB path:
    * a coarse quantizer buckets the corpus into `nlist` cells, each
    * corpus vector is encoded as `m` small codes (nearest per-subspace
    * centroid), and a query ADC-scans ONLY its `nProbe` best cells —
    * so candidate scoring reads m×4 bytes of codes for ~nProbe/nlist
    * of the corpus instead of dim×4 bytes of floats for all of it,
    * and the ADC ranking exchange carries only (q_id, n_id, score).
    * The classic recipe (Jégou et al., PQ for nearest neighbor
    * search) in three stages:
    *
    *  1. TRAIN (driver, bounded): coarse Lloyd k-means ([[trainCoarse]],
    *     shared with [[ivfTopK]]) plus per-subspace Lloyd codebooks on
    *     a hash-decorrelated normalized sample.
    *  2. ENCODE (ONE distributed pass, row-local, codegen'd): the
    *     coarse cell via argmax over (score, −cell) structs, and per
    *     subspace argmax_j of dot(x_sub, c_j)/|x| − |c_j|²/2 — the
    *     L2-nearest centroid of the NORMALIZED subvector, computed
    *     without materializing the normalized vector.
    *  3. SEARCH: each query row-locally picks its nProbe best cells
    *     (sort+slice of the same struct array) and broadcasts
    *     per-subspace lookup tables T[j] = dot(q̂_sub, c_j); the ADC
    *     join is an EQUI-join on cell (BroadcastHashJoin, not a
    *     nested-loop corpus scan), score = Σ_sub T[code_sub] ≈
    *     cos(q̂, x̂). The top refine·k ADC candidates per query are
    *     re-ranked with exact cosine (candidates broadcast BACK
    *     against the corpus, so the full-vector read touches only
    *     candidate rows — never a second corpus shuffle).
    *
    * Deterministic end to end (fixed init, fixed iterations, id
    * tiebreaks). Output schema matches [[bruteForce]] for the recall
    * specs.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      m: Int = 4,
      ksub: Int = 32,
      iters: Int = 5,
      refine: Int = 4,
      nlist: Int = 16,
      nProbe: Int = 8,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      trainSample: Int = 4096): DataFrame = {
    val c0 = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val elemIsFloat = c0.schema("n_v").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val sampleRaw: Array[Array[Double]] = hashTrainSample(c0, trainSample)
    require(sampleRaw.nonEmpty, "pqTopK: empty corpus")
    val dim = sampleRaw.head.length
    require(dim % m == 0, s"pqTopK: dim $dim not divisible by m=$m")
    val sub = dim / m
    def l2(a: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      math.sqrt(s) max 1e-300
    }
    val sample = sampleRaw.map { v => val n = l2(v); v.map(_ / n) }

    // per-subspace Lloyd on L2 over normalized subvectors;
    // deterministic: first-ksub init, fixed iters, empty cells keep
    // their centroid
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { mi =>
      val vs = sample.map(v => v.slice(mi * sub, (mi + 1) * sub))
      var cents = vs.take(ksub).map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Long](cents.length)
        vs.foreach { v =>
          var best = 0; var bd = Double.MaxValue
          var j = 0
          while (j < cents.length) {
            var d = 0.0; var i = 0
            while (i < sub) { val t = v(i) - cents(j)(i); d += t * t; i += 1 }
            if (d < bd) { bd = d; best = j }
            j += 1
          }
          counts(best) += 1
          var i = 0; while (i < sub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.zipWithIndex.map { case (old, j) =>
          if (counts(j) == 0) old else sums(j).map(_ / counts(j))
        }
      }
      cents
    }

    // coarse quantizer: the IVF stage in front of the PQ scan (trained
    // on the raw sample like ivfTopK — dot/centroid-norm scoring makes
    // the assignment argmax cosine-equivalent, so raw vs normalized
    // sample only rescales centroids within a cell)
    val cents = trainCoarse(sampleRaw, nlist, iters)

    import org.apache.spark.sql.graftbridge.ColumnBridge
    // ENCODE: coarse cell + all m PQ codes in two native codegen'd
    // expressions per row. The earlier literal formulation (m×ksub
    // slice+dot struct subtrees per row, nlist more for the cell)
    // spent ~4 s per run in analysis + Janino compilation of a
    // multi-hundred-KB generated function — fixed overhead that
    // dwarfed the actual scan at test scale and would recur on every
    // executor's codegen cache miss at cluster scale.
    val coded = c0
      .repartition(c0.sparkSession.sparkContext.defaultParallelism, col("n_id"))
      .select(col("n_id"),
        element_at(cellProbesCol(cents, 1)(col("n_v")), 1).as("cell"),
        ColumnBridge.column(graft.functions.PqCodes(
          ColumnBridge.expression(col("n_v")), codebooks)).as("codes"))

    // queries carry per-subspace ADC tables T[mi][j] = dot(q̂_sub,
    // c_j), then fan out row-locally to their nProbe best coarse
    // cells. q_v is dropped before the broadcast — the ADC join needs
    // only the tables and the cell key.
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .select(col("q_id"),
        ColumnBridge.column(graft.functions.AdcTables(
          ColumnBridge.expression(col("q_v")), codebooks)).as("t"),
        explode(cellProbesCol(cents, nProbe)(col("q_v"))).as("cell"))

    // ADC ranking over the probed cells only: a BroadcastHashJoin on
    // cell — never a nested-loop full-corpus scan — and the exchange
    // carries (q_id, n_id, adc) ONLY
    val adc = coded.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", ColumnBridge.column(graft.functions.AdcScore(
        ColumnBridge.expression(col("t")),
        ColumnBridge.expression(col("codes")))))
      .select(col("q_id"), col("n_id"), col("adc"))
    val w1 = W.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id"))
    val cand = adc.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= refine.toLong * k)
      .select(col("q_id"), col("n_id"))

    // exact re-rank of the small candidate set: candidates broadcast
    // back against the corpus — full vectors are read for candidate
    // rows only, the corpus never shuffles
    val qv = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val rer = c0.withColumn("n_n", norm(col("n_v")))
      .join(broadcast(cand), Seq("n_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("cos", dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w2 = W.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    rer.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 8,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val sig = hyperplaneSig(col(vecCol), nBits)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      sig.as("bucket")).withColumn("n_n", norm(col("n_v")))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sig.as("bucket")).withColumn("q_n", norm(col("q_v")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cos", dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w = W.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** Multi-probe LSH ANN: each query searches its own hyperplane
    * bucket PLUS every Hamming-1 neighbour (one sign bit flipped) —
    * the classic recall refinement: a near neighbour on the far side
    * of ONE hyperplane is recovered without adding tables. Cost:
    * (nBits+1) probes per query instead of 1, still sub-linear in the
    * corpus; the query side fans out row-locally (explode of nBits+1
    * probe keys) before the same broadcast bucket join, so the plan
    * shape — and its scale story — is identical to [[lshTopK]].
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nBits: Int = 8,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val sig = hyperplaneSig(col(vecCol), nBits)
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_v"),
      sig.as("bucket")).withColumn("n_n", norm(col("n_v")))
    val probes = array((lit(0L) +:
      (0 until nBits).map(i => lit(1L << i))): _*)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"),
      sig.as("home"))
      .withColumn("q_n", norm(col("q_v")))
      .select(col("q_id"), col("q_v"), col("q_n"),
        explode(transform(probes, m => col("home").bitwiseXOR(m)))
          .as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      // a corpus vector can land in several of a query's probes only
      // if buckets collide post-xor (they cannot: xor is a bijection),
      // so no distinct is needed before ranking
      .withColumn("cos", dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
    val w = W.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication" — the centroid-anchored linear variant): k-means
    * clusters the embedding space; within each cluster the vector
    * most similar to the centroid is the KEEPER, and every other
    * member is dropped iff its cosine to the keeper reaches `tau`.
    * Unlike [[graft.dedup.Dedup]]'s near-dup paths (which find
    * lexical copies), this removes semantically redundant documents
    * that share no tokens.
    *
    * Scale shape — linear end to end, no pair enumeration: bounded
    * driver-side Lloyd ([[trainCoarse]], shared with IVF), row-local
    * native cell assignment, keeper election as a (nlist-row) partial
    * aggregate, and the keeper set broadcast back onto the members
    * for one row-local cosine. The only exchange is the keeper
    * election's nlist-key shuffle. The lazy plan scans the corpus
    * twice (election pass + member pass, each re-deriving the
    * row-local assignment); at 100 TB the assigned narrow projection
    * would be persisted/bucketed between the passes — the plan shape
    * is otherwise unchanged. nlist grows with the corpus (SemDeDup's
    * recipe).
    *
    * Deterministic: fixed Lloyd init/iterations, cosine ties elect
    * the lowest id. Output one row per vector:
    * (vec_id, cell, keeper_id, cos_keeper, kept).
    */
  /** Cluster-balanced sampling for training-mixture curation: cap
    * every embedding cluster's contribution at ~`perCell` vectors so
    * over-represented modes (boilerplate, template families) stop
    * dominating the mixture — the cluster-then-subsample recipe of
    * data-curation pipelines (e.g. DataComp-style pool balancing),
    * sharing [[semDedup]]'s coarse quantizer.
    *
    * Scale shape: NO per-cell window sort (a rank over nlist
    * partitions would cap parallelism at nlist and sort each cell).
    * Instead: one row-local assignment pass, a ≤nlist-row count
    * aggregate broadcast back, and a deterministic FNV keep-threshold
    * per cell (t7's stratified-sampling shape) — every stage
    * row-local or bounded, reruns decide identically, re-balancing is
    * a threshold move. The quota is therefore EXPECTED-value (~
    * binomial around perCell), which is the correct trade at 100 TB:
    * balanced mixtures need proportions, not exact counts.
    */
  def clusterSample(
      corpus: DataFrame,
      perCell: Int,
      nlist: Int = 16,
      iters: Int = 3,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      trainSample: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import graft.functions.Fnv64
    val c = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("n_v"))
    val sample: Array[Array[Double]] = hashTrainSample(c, trainSample)
    require(sample.nonEmpty, "clusterSample: empty corpus")
    val cents = trainCoarse(sample, nlist, iters)
    val assigned = c.withColumn("cell",
      element_at(cellProbesCol(cents, 1)(col("n_v")), 1))
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_size"))
    // rate is TRUNCATED to whole ppm before anything compares against
    // it: `/` on longs is double division in Spark, and comparing the
    // bucket against a fractional rate while EMITTING the truncated
    // rate_ppm column made `kept` disagree with the published
    // threshold on boundary buckets (bucket == floor(rate)) — the
    // kind of one-in-a-million divergence that passes small-SF gates
    // and flakes at scale. Integer semantics end to end.
    val rated = assigned.join(broadcast(sizes), Seq("cell"))
      .withColumn("rate_ppm", least(lit(1000000L),
        (lit(perCell.toLong) * lit(1000000L) / col("cell_size"))
          .cast("long")))
      .withColumn("bucket", Fnv64.unsignedMod(
        Fnv64(concat(lit("cs|"), col("n_id").cast("string"))), 1000000L))
    rated.select(
      col("n_id").as("vec_id"),
      col("cell").cast("long").as("cell"),
      col("cell_size").cast("long").as("cell_size"),
      col("rate_ppm").as("rate_ppm"),
      (col("bucket") < col("rate_ppm")).as("kept"))
  }

  def semDedup(
      corpus: DataFrame,
      tau: Double,
      nlist: Int = 16,
      iters: Int = 3,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      trainSample: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("n_id"),
      col(vecCol).cast("array<double>").as("n_v"))
    val sample: Array[Array[Double]] = hashTrainSample(c, trainSample)
    require(sample.nonEmpty, "semDedup: empty corpus")
    val cents = trainCoarse(sample, nlist, iters)

    // centroids ride as DATA (nlist rows, broadcast), not as literal
    // expression trees — the cos-to-centroid is a data-to-data dot
    val centsDf = cents.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq.toDF("cell", "c_v")
    val assigned = c
      .withColumn("cell", element_at(cellProbesCol(cents, 1)(col("n_v")), 1))
      .withColumn("n_n", norm(col("n_v")))
    val withC = assigned.join(broadcast(centsDf), Seq("cell"))
      .withColumn("cos_c",
        dot(col("n_v"), col("c_v")) / (col("n_n") * norm(col("c_v"))))
    // keeper election: max cos-to-centroid, ties to the lowest id
    val keepers = withC.groupBy("cell")
      .agg(max_by(struct(col("n_id"), col("n_v"), col("n_n")),
        struct(col("cos_c"), -col("n_id"))).as("k"))
      .select(col("cell"), col("k.n_id").as("keeper_id"),
        col("k.n_v").as("k_v"), col("k.n_n").as("k_n"))
    assigned.join(broadcast(keepers), Seq("cell"))
      .withColumn("cos_k",
        dot(col("n_v"), col("k_v")) / (col("n_n") * col("k_n")))
      .select(col("n_id").as("vec_id"), col("cell").cast("long").as("cell"),
        col("keeper_id"),
        round(col("cos_k"), 6).as("cos_keeper"),
        (col("n_id") === col("keeper_id") || col("cos_k") < tau).as("kept"))
  }
}
