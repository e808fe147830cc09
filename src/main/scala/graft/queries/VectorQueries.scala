package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ann.Knn
import graft.dedup.Dedup

/** Embedding surface (SURVEY §2 #39–41): ANN search and
  * embedding-cosine near-dup. The oracle reproduces the exact
  * in-order double fold used by VectorFunctions.dot, so cosines are
  * bit-identical across engines.
  */
object VectorQueries {

  /** DuckDB in-order dot product over DOUBLE[] (left fold, like
    * functions.aggregate with a 0-init: 0 + p1 + p2 + ...).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, [$a[i] * $b[i] for i in generate_series(1, len($a))]), (x, y) -> x + y)"

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** 2^64 — the modulus for the oracle's hyperplane-hash arithmetic. */
  private val m64 = "18446744073709551616"

  val defs: Map[String, QueryDef] = Map(

    // --- #40 brute-force cosine top-10 for query vectors (id < 10) ---
    "v1_knn" -> QueryDef.of(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${cosSql("q.v", "c.v")} AS cos
         |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM p)
         |SELECT q_id, n_id, CAST(rnk AS BIGINT) AS rank, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 10""".stripMargin) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.bruteForce(e, e.filter(col("vec_id") < 10), k = 10)
      }
    },

    // --- #39 embedding-cosine near-dup pairs (label-blocked) ---
    "v2_embed_dedup" -> QueryDef.of(
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= 0.35""".stripMargin) {
      (s, dir) =>
        Dedup.embeddingPairs(Tables(s, dir).embeddings,
          threshold = 0.35, blockCol = col("label"))
    },

    // --- #35d embedding-space decontamination: corpus vectors at
    // cosine >= tau to ANY benchmark vector (vec_id < 20 stands in
    // for the eval set), best match per vector. Benchmark broadcast,
    // corpus never shuffles; the oracle recomputes every cosine with
    // the same in-order fold and re-ranks (cos DESC, bench_id) ---
    "d8_embed_decontam" -> QueryDef.of(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id AS bench_id, v FROM e WHERE vec_id < 20),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id >= 20),
         |p AS (
         |  SELECT c.vec_id, b.bench_id, ${cosSql("c.v", "b.v")} AS cos
         |  FROM c JOIN b ON ${cosSql("c.v", "b.v")} >= 0.35),
         |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY cos DESC, bench_id) AS rnk FROM p)
         |SELECT vec_id, bench_id, round(cos, 6) AS cos
         |FROM r WHERE rnk = 1""".stripMargin) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Dedup.embeddingDecontaminate(
          e.filter(col("vec_id") >= 20), e.filter(col("vec_id") < 20),
          tau = 0.35)
      }
    },

    // --- #41 LSH-bucketed ANN (scale path; spec checks recall vs v1),
    // fully oracled: the oracle re-derives every hyperplane component
    // w(i,j) = splitmix64((i<<32)+j) % 1e6 / 2e6 with 128-bit modular
    // arithmetic (exactly HyperplaneUtil.component), folds the
    // projections in dim order, buckets on the 4-bit sign signature,
    // and ranks in-bucket cosine — integer/IEEE-exact end to end ---
    "v3_knn_lsh" -> QueryDef.of(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bits AS (SELECT unnest(range(0, 4)) AS i),
         |dims AS (SELECT unnest(range(0, (SELECT MAX(len(v)) FROM e))) AS j),
         |percomp AS (
         |  SELECT b.i, d.j,
         |    CAST((CAST(b.i AS HUGEINT) * 4294967296::HUGEINT + CAST(d.j AS HUGEINT)
         |      + 11400714819323198485::HUGEINT) % $m64::HUGEINT AS UBIGINT) AS z0,
         |    CAST((CAST(xor(z0, z0 >> 30) AS UHUGEINT) * 13787848793156543929::UHUGEINT
         |      % $m64::UHUGEINT) AS UBIGINT) AS z1,
         |    CAST((CAST(xor(z1, z1 >> 27) AS UHUGEINT) * 10723151780598845931::UHUGEINT
         |      % $m64::UHUGEINT) AS UBIGINT) AS z2,
         |    xor(z2, z2 >> 31) AS z3,
         |    CAST(CASE WHEN z3 >= 9223372036854775808::UBIGINT
         |      THEN CAST(z3 AS HUGEINT) - $m64::HUGEINT
         |      ELSE CAST(z3 AS HUGEINT) END AS BIGINT) AS zs,
         |    CAST(zs % 1000000 AS DOUBLE) / 2000000.0::DOUBLE AS comp
         |  FROM bits b CROSS JOIN dims d),
         |comps AS (SELECT i, list(comp ORDER BY j) AS cl FROM percomp GROUP BY i),
         |projs AS (
         |  SELECT e.vec_id, c.i,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      [v[j] * c.cl[j] for j in generate_series(1, len(v))]),
         |      (x, y) -> x + y) AS proj
         |  FROM e CROSS JOIN comps c),
         |buckets AS (
         |  SELECT vec_id,
         |    SUM(CASE WHEN proj >= 0 THEN (1::BIGINT << CAST(i AS INT))
         |      ELSE 0::BIGINT END) AS bucket
         |  FROM projs GROUP BY vec_id),
         |p AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${cosSql("q.v", "c.v")} AS cos
         |  FROM e q JOIN buckets bq ON bq.vec_id = q.vec_id
         |  JOIN buckets bc ON bc.bucket = bq.bucket
         |  JOIN e c ON c.vec_id = bc.vec_id AND c.vec_id != q.vec_id
         |  WHERE q.vec_id < 10),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM p)
         |SELECT q_id, n_id, CAST(rnk AS BIGINT) AS rank, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 10""".stripMargin) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.lshTopK(e, e.filter(col("vec_id") < 10), k = 10, nBits = 4)
      }
    },

    // --- #41 multi-probe LSH ANN: the query searches its home bucket
    // plus every Hamming-1 neighbour — candidates are exactly the
    // corpus vectors whose bucket differs in ≤1 bit, which is how the
    // oracle states it (bit_count(xor) <= 1 over the re-derived
    // signatures) ---
    "v5_knn_lsh_multiprobe" -> QueryDef.of(
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bits AS (SELECT unnest(range(0, 4)) AS i),
         |dims AS (SELECT unnest(range(0, (SELECT MAX(len(v)) FROM e))) AS j),
         |percomp AS (
         |  SELECT b.i, d.j,
         |    CAST((CAST(b.i AS HUGEINT) * 4294967296::HUGEINT + CAST(d.j AS HUGEINT)
         |      + 11400714819323198485::HUGEINT) % $m64::HUGEINT AS UBIGINT) AS z0,
         |    CAST((CAST(xor(z0, z0 >> 30) AS UHUGEINT) * 13787848793156543929::UHUGEINT
         |      % $m64::UHUGEINT) AS UBIGINT) AS z1,
         |    CAST((CAST(xor(z1, z1 >> 27) AS UHUGEINT) * 10723151780598845931::UHUGEINT
         |      % $m64::UHUGEINT) AS UBIGINT) AS z2,
         |    xor(z2, z2 >> 31) AS z3,
         |    CAST(CASE WHEN z3 >= 9223372036854775808::UBIGINT
         |      THEN CAST(z3 AS HUGEINT) - $m64::HUGEINT
         |      ELSE CAST(z3 AS HUGEINT) END AS BIGINT) AS zs,
         |    CAST(zs % 1000000 AS DOUBLE) / 2000000.0::DOUBLE AS comp
         |  FROM bits b CROSS JOIN dims d),
         |comps AS (SELECT i, list(comp ORDER BY j) AS cl FROM percomp GROUP BY i),
         |projs AS (
         |  SELECT e.vec_id, c.i,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      [v[j] * c.cl[j] for j in generate_series(1, len(v))]),
         |      (x, y) -> x + y) AS proj
         |  FROM e CROSS JOIN comps c),
         |buckets AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN proj >= 0 THEN (1::BIGINT << CAST(i AS INT))
         |      ELSE 0::BIGINT END) AS BIGINT) AS bucket
         |  FROM projs GROUP BY vec_id),
         |p AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |    ${cosSql("q.v", "c.v")} AS cos
         |  FROM e q JOIN buckets bq ON bq.vec_id = q.vec_id
         |  JOIN buckets bc ON bit_count(xor(bq.bucket, bc.bucket)) <= 1
         |  JOIN e c ON c.vec_id = bc.vec_id AND c.vec_id != q.vec_id
         |  WHERE q.vec_id < 10),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk FROM p)
         |SELECT q_id, n_id, CAST(rnk AS BIGINT) AS rank, round(cos, 6) AS cos
         |FROM r WHERE rnk <= 10""".stripMargin) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.lshTopKMultiProbe(e, e.filter(col("vec_id") < 10), k = 10,
          nBits = 4)
      }
    },

    // --- #41b IVF ANN: k-means cells + nProbe search (scale path).
    // FULLY HASH-ORACLED since r9: Lloyd training is deterministic
    // (fixed sample order, in-order float folds), so the DuckDB
    // oracle re-runs it — XXH64 sample ordering + 3 unrolled
    // iterations + assignment + cosine ranking, bit-for-bit (see
    // KmeansOracle) ---
    "v4_knn_ivf" -> QueryDef.of(
      KmeansOracle.v4Sql(k = 10, nlist = 16, nProbe = 4)) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.ivfTopK(e, e.filter(col("vec_id") < 10), k = 10,
          nlist = 16, nProbe = 4)
      }
    },

    // --- #41c product-quantization ANN (memory-bound scale path):
    // codes instead of vectors in the candidate scan, ADC tables,
    // exact re-rank of the top candidates. FULLY HASH-ORACLED since
    // r9 (KmeansOracle.v6Sql re-derives BOTH quantizer trainings, the
    // PQ encode, the in-order ADC fold and the re-rank);
    // recall-vs-brute-force stays spec-pinned like v4's ---
    "v6_knn_ivfpq" -> QueryDef.of(
      KmeansOracle.v6Sql(k = 10, m = 8, ksub = 32, refine = 6)) {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.pqTopK(e, e.filter(col("vec_id") < 10), k = 10,
          m = 8, ksub = 32, refine = 6)
      }
    },

    // --- #41d SemDeDup semantic dedup (centroid-anchored linear
    // variant): k-means cells, per-cell keeper election, drop members
    // at cos >= tau to the keeper. FULLY HASH-ORACLED since r9
    // (KmeansOracle.v7Sql re-derives training + keepers + cos flags);
    // keeper-uniqueness / drop-bound / determinism stay spec-pinned ---
    "v7_semdedup" -> QueryDef.of(KmeansOracle.v7Sql(tau = 0.95, nlist = 16)) {
      (s, dir) =>
        Knn.semDedup(Tables(s, dir).embeddings, tau = 0.95, nlist = 16)
    },

    // --- #41e cluster-balanced sampling (mixture curation): cap each
    // embedding cluster at ~perCell vectors via a deterministic FNV
    // keep-threshold — no per-cell window sort, so parallelism never
    // caps at nlist. FULLY HASH-ORACLED since r9 (KmeansOracle.v8Sql);
    // quota/coverage/determinism stay spec-pinned ---
    "v8_cluster_sample" -> QueryDef.of(
      KmeansOracle.v8Sql(perCell = 12, nlist = 16)) {
      (s, dir) =>
        Knn.clusterSample(Tables(s, dir).embeddings, perCell = 12,
          nlist = 16)
    },

    // --- #41f hybrid retrieval (BM25 ⊕ vector) with reciprocal-rank
    // fusion — the standard two-tower search shape (sparse lexical +
    // dense semantic candidates, fused on RANK so the two score
    // scales never need calibrating; Cormack et al. 2009). Each side
    // is an independently 100 TB-ready top-k (BM25 broadcast-stats
    // scan → TakeOrderedAndProject; cosine the v1 broadcast-probe),
    // the fusion a full-outer join of two ≤50-row sides. RRF is kept
    // EXACT: 1e12 div (60+rank) in integer arithmetic, so no double
    // ever orders the output. BM25 ranks on the 6dp-rounded score
    // (the t11 gate pins those bit-equal), cosine on the raw
    // in-order fold (the v1 gate) — both tie-broken by id ---
    "v9_hybrid_rrf" -> QueryDef.of {
      val t11 = graft.queries.TextQueries.defs("t11_bm25").oracle.get
      s"""WITH tq AS ($t11),
         |tr AS (
         |  SELECT doc_id, bm25_rank FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank
         |    FROM tq) WHERE bm25_rank <= 50),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |p AS (
         |  SELECT c.vec_id AS n_id, ${cosSql("q.v", "c.v")} AS cos
         |  FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id != 0),
         |vr AS (
         |  SELECT n_id, cos_rank FROM (
         |    SELECT n_id,
         |      row_number() OVER (ORDER BY cos DESC, n_id) AS cos_rank
         |    FROM p) WHERE cos_rank <= 50),
         |f AS (
         |  SELECT COALESCE(tr.doc_id, vr.n_id) AS doc_id,
         |    CAST(tr.bm25_rank AS BIGINT) AS bm25_rank,
         |    CAST(vr.cos_rank AS BIGINT) AS cos_rank,
         |    COALESCE(1000000000000 // (60 + tr.bm25_rank), 0)
         |      + COALESCE(1000000000000 // (60 + vr.cos_rank), 0) AS rrf
         |  FROM tr FULL JOIN vr ON tr.doc_id = vr.n_id)
         |SELECT doc_id, bm25_rank, cos_rank,
         |  CAST(rrf AS BIGINT) AS rrf_scaled
         |FROM f ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin
    } { (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val terms = Seq("spark", "join", "window", "dup")
      // lexical side: distributed top-50 (TakeOrderedAndProject),
      // then ranks assigned by a window over ONLY those 50 rows
      val tTop = graft.text.TextAnalysis.bm25(
          Tables(s, dir).documents, col("doc_id"), col("text"), terms)
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
        .withColumn("bm25_rank", row_number()
          .over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("long"))
        .select(col("doc_id").as("t_id"), col("bm25_rank"))
      val e = Tables(s, dir).embeddings
      val vTop = Knn.bruteForce(e, e.filter(col("vec_id") === 0), k = 50)
        .select(col("n_id").as("v_id"), col("rank").as("cos_rank"))
      tTop.join(vTop, col("t_id") === col("v_id"), "full_outer")
        .select(coalesce(col("t_id"), col("v_id")).as("doc_id"),
          col("bm25_rank"), col("cos_rank"),
          (coalesce(expr("1000000000000L div (60 + bm25_rank)"), lit(0L))
            + coalesce(expr("1000000000000L div (60 + cos_rank)"), lit(0L)))
            .as("rrf_scaled"))
        .orderBy(col("rrf_scaled").desc, col("doc_id")).limit(20)
    } })
}
