package graft.queries

/** DuckDB twins of the Lloyd-trained ANN operators (v4 IVF, v7
  * SemDeDup, v8 cluster sampling) — the same unrolled-deterministic-
  * iteration idea as the BPE oracle, extended to FLOATING POINT:
  * every double operation in the Spark path is an IEEE primitive
  * applied in a FIXED order (driver-side sequential training, native
  * in-order dot-product folds), so DuckDB reproduces the bits exactly
  * as long as the oracle performs the same operations in the same
  * order:
  *
  *  - the 4096-vector training sample is the corpus sorted by
  *    (xxhash64(id), id) — reproduced with a full XXH64-for-one-long
  *    derivation in 64-bit modular SQL (split 32×32 multiplies keep
  *    every intermediate inside HUGEINT; validated against Spark's
  *    xxhash64 output);
  *  - Lloyd iterations unroll as CTE rounds: norms are in-order
  *    sum-of-square folds (list_reduce = left fold, matching the
  *    JVM loop), assignment is argmax by (score DESC, cell ASC) (the
  *    strict-> first-wins tie rule), per-cell mean vectors fold the
  *    assigned vectors IN SAMPLE ORDER (list(v ORDER BY pos) then a
  *    pairwise list_reduce — float addition is order-sensitive and
  *    the JVM accumulates in exactly that order);
  *  - search/keeper/sampling downstream reuses the proven in-order
  *    dot folds, row_number tie-breaks, round(,6), and the FNV-1a
  *    bucket derivation shared with t7.
  *
  * Validated three ways at sf0.01: an independent Python
  * reimplementation, the Spark output parquet (bit-equal), and the
  * DuckDB oracle (bit-equal to both). [[v6Sql]] extends the same
  * machinery to IVF-PQ: the m per-subspace codebook trainings unroll
  * exactly like the coarse quantizer (data-parallel over the
  * subspace dimension), and the ADC score folds its table lookups in
  * subspace order.
  */
object KmeansOracle {

  private val M64 = "18446744073709551616"
  // XXH64 primes
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  /** (a * prime) mod 2^64 with 32-bit split multiplies: a full 64×64
    * product overflows even HUGEINT, but aLo*bLo and the cross terms
    * each fit comfortably.
    */
  private def mul(a: String, prime: BigInt): String = {
    val bLo = prime & 0xFFFFFFFFL
    val bHi = prime >> 32
    val lo = s"CAST(($a) & 4294967295::UBIGINT AS HUGEINT)"
    val hi = s"CAST(($a) >> 32 AS HUGEINT)"
    s"CAST(($lo * $bLo::HUGEINT + (($lo * $bHi::HUGEINT + $hi * $bLo::HUGEINT) " +
      s"% 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M64::HUGEINT AS UBIGINT)"
  }

  private def rotl(x: String, r: Int): String =
    s"(CAST((CAST($x AS HUGEINT) * ${BigInt(1) << r}::HUGEINT % $M64::HUGEINT) " +
      s"AS UBIGINT) | ($x >> ${64 - r}))"

  /** samp0: every corpus vector with its Spark-identical signed
    * xxhash64 (seed 42, single-long input path) and the DOUBLE[]
    * widening of the stored floats.
    */
  private def samp0(where: String = ""): String =
    s"""SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |  CAST(CAST(h9 AS HUGEINT) - CASE WHEN h9 >= 9223372036854775808::UBIGINT
       |    THEN $M64::HUGEINT ELSE 0::HUGEINT END AS BIGINT) AS hs
       |FROM (
       |  SELECT vec_id, embedding, xor(h8, h8 >> 32) AS h9 FROM (
       |    SELECT vec_id, embedding, ${mul("h7", P3)} AS h8 FROM (
       |      SELECT vec_id, embedding, xor(h6, h6 >> 29) AS h7 FROM (
       |        SELECT vec_id, embedding, ${mul("h5", P2)} AS h6 FROM (
       |          SELECT vec_id, embedding, xor(h4, h4 >> 33) AS h5 FROM (
       |            SELECT vec_id, embedding,
       |              CAST((CAST(${mul(rotl("h3", 27), P1)} AS HUGEINT) + $P4::HUGEINT)
       |                % $M64::HUGEINT AS UBIGINT) AS h4 FROM (
       |              SELECT vec_id, embedding,
       |                xor(h0, ${mul(rotl("k1", 31), P1)}) AS h3 FROM (
       |                SELECT vec_id, embedding,
       |                  CAST((42::HUGEINT + $P5::HUGEINT + 8) % $M64::HUGEINT AS UBIGINT) AS h0,
       |                  ${mul("CAST(CAST(vec_id AS BIGINT) AS UBIGINT)", P2)} AS k1
       |                FROM embeddings $where))))))))""".stripMargin

  /** In-order left-fold dot product over two DOUBLE[] — the SQL twin
    * of the native DotProduct expression.
    */
  private def ddot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), z -> z[1] * z[2]), (x, y) -> x + y)"

  private def sumSq(c: String): String =
    s"list_reduce(list_transform($c, x -> x*x), (a,b) -> a+b)"

  /** The shared training + corpus-assignment CTE chain:
    * samp0 → samp (hash-ordered sample) → c0..c{iters} (Lloyd) →
    * cn (final centroids + GUARDED norms, as cellProbes uses) →
    * corp (every vector's best cell + its own unguarded norm).
    */
  private def trainCtes(nlist: Int, iters: Int, trainSample: Int): String = {
    val parts = Seq.newBuilder[String]
    parts += s"samp0 AS MATERIALIZED (${samp0()})"
    parts += s"samp AS MATERIALIZED (SELECT row_number() OVER (ORDER BY hs, vec_id) AS pos, v " +
      s"FROM samp0 ORDER BY hs, vec_id LIMIT $trainSample)"
    parts += s"c0 AS (SELECT pos - 1 AS cell, v AS c_v FROM samp WHERE pos <= $nlist)"
    var prev = "c0"
    for (it <- 1 to iters) {
      parts +=
        s"""n$it AS MATERIALIZED (SELECT cell, c_v,
           |  greatest(sqrt(${sumSq("c_v")}), 1e-300) AS nrm FROM $prev)""".stripMargin
      parts +=
        s"""a$it AS (
           |  SELECT pos, v, cell FROM (
           |    SELECT s.pos, s.v, n.cell,
           |      row_number() OVER (PARTITION BY s.pos
           |        ORDER BY ${ddot("s.v", "n.c_v")} / n.nrm DESC, n.cell) AS rn
           |    FROM samp s CROSS JOIN n$it n)
           |  WHERE rn = 1)""".stripMargin
      parts +=
        s"""m$it AS (
           |  SELECT cell, CAST(count(*) AS DOUBLE) AS cnt,
           |    list_reduce(list(v ORDER BY pos),
           |      (a,b) -> list_transform(list_zip(a, b), z -> z[1] + z[2])) AS sm
           |  FROM a$it GROUP BY cell)""".stripMargin
      parts +=
        s"""c$it AS (
           |  SELECT p.cell AS cell,
           |    CASE WHEN m.cell IS NULL THEN p.c_v
           |         ELSE list_transform(m.sm, x -> x / m.cnt) END AS c_v
           |  FROM $prev p LEFT JOIN m$it m ON p.cell = m.cell)""".stripMargin
      prev = s"c$it"
    }
    parts += s"cn AS MATERIALIZED (SELECT cell, c_v, " +
      s"greatest(sqrt(${sumSq("c_v")}), 1e-300) AS nrm FROM $prev)"
    parts +=
      s"""corp AS MATERIALIZED (
         |  SELECT vec_id AS n_id, v AS n_v, cell, sqrt(${sumSq("v")}) AS n_n
         |  FROM (
         |    SELECT s.vec_id, s.v, c.cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY ${ddot("s.v", "c.c_v")} / c.nrm DESC, c.cell) AS rn
         |    FROM samp0 s CROSS JOIN cn c)
         |  WHERE rn = 1)""".stripMargin
    parts.result().mkString(",\n")
  }

  /** v4: IVF top-k for queries vec_id < 10 over the probed cells. */
  def v4Sql(k: Int, nlist: Int, nProbe: Int, trainSample: Int = 4096): String =
    s"""WITH ${trainCtes(nlist, iters = 3, trainSample)},
       |qp AS (
       |  SELECT vec_id AS q_id, v AS q_v, cell, sqrt(${sumSq("v")}) AS q_n
       |  FROM (
       |    SELECT s.vec_id, s.v, c.cell,
       |      row_number() OVER (PARTITION BY s.vec_id
       |        ORDER BY ${ddot("s.v", "c.c_v")} / c.nrm DESC, c.cell) AS rn
       |    FROM samp0 s CROSS JOIN cn c
       |    WHERE s.vec_id < 10)
       |  WHERE rn <= $nProbe)
       |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cos FROM (
       |  SELECT q.q_id, c.n_id,
       |    ${ddot("q.q_v", "c.n_v")} / (q.q_n * c.n_n) AS cos,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY ${ddot("q.q_v", "c.n_v")} / (q.q_n * c.n_n) DESC, c.n_id) AS rank
       |  FROM corp c JOIN qp q USING (cell) WHERE q.q_id != c.n_id)
       |WHERE rank <= $k""".stripMargin

  /** v7: per-cell keeper election + drop-at-tau flags. cos uses the
    * UNGUARDED centroid/vector norms (matching the Spark path, which
    * guards only the assignment-side centNorms).
    */
  def v7Sql(tau: Double, nlist: Int, trainSample: Int = 4096): String =
    s"""WITH ${trainCtes(nlist, iters = 3, trainSample)},
       |wc AS (
       |  SELECT c.n_id, c.n_v, c.n_n, c.cell,
       |    ${ddot("c.n_v", "n.c_v")} / (c.n_n * sqrt(${sumSq("n.c_v")})) AS cos_c
       |  FROM corp c JOIN cn n USING (cell)),
       |keep AS (
       |  SELECT cell, n_id AS keeper_id, n_v AS k_v, n_n AS k_n FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cell
       |      ORDER BY cos_c DESC, n_id) AS rn FROM wc)
       |  WHERE rn = 1)
       |SELECT c.n_id AS vec_id, CAST(c.cell AS BIGINT) AS cell, k.keeper_id,
       |  round(${ddot("c.n_v", "k.k_v")} / (c.n_n * k.k_n), 6) AS cos_keeper,
       |  (c.n_id = k.keeper_id OR
       |   ${ddot("c.n_v", "k.k_v")} / (c.n_n * k.k_n) < $tau) AS kept
       |FROM corp c JOIN keep k USING (cell)""".stripMargin

  private def l2d(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"z -> (z[1] - z[2]) * (z[1] - z[2])), (x, y) -> x + y)"

  /** v6: the full IVF-PQ pipeline — coarse Lloyd (iters=5) PLUS m
    * per-subspace Lloyd codebooks over L2-normalized subvectors, PQ
    * encode (argmax of dot(v_sub, c_j)/|v| − |c_j|²/2 per subspace),
    * ADC scoring (per-(q,n) fold of table lookups IN SUBSPACE ORDER —
    * a bare SUM() would reorder the float additions), refine·k
    * candidate cut, exact-cosine re-rank. Same determinism argument
    * as v4/v7/v8, just with two quantizer trainings.
    */
  def v6Sql(k: Int, m: Int, ksub: Int, refine: Int, nlist: Int = 16,
      nProbe: Int = 8, iters: Int = 5, dim: Int = 64,
      trainSample: Int = 4096): String = {
    val sub = dim / m
    def slice(v: String, mi: String) = s"$v[($mi*$sub+1):($mi*$sub+$sub)]"
    val pq = Seq.newBuilder[String]
    pq += s"sampN AS MATERIALIZED (SELECT pos, list_transform(v, " +
      s"x -> x / greatest(sqrt(${sumSq("v")}), 1e-300)) AS v FROM samp)"
    pq += s"sv AS MATERIALIZED (SELECT pos, mi, ${slice("v", "mi")} AS sv " +
      s"FROM sampN, (SELECT unnest(range(0, $m)) AS mi))"
    pq += s"pq0 AS (SELECT mi, pos - 1 AS j, sv AS c_v FROM sv WHERE pos <= $ksub)"
    var prev = "pq0"
    for (it <- 1 to iters) {
      pq +=
        s"""pa$it AS (SELECT pos, mi, sv, j FROM (
           |  SELECT s.pos, s.mi, s.sv, b.j,
           |    row_number() OVER (PARTITION BY s.pos, s.mi
           |      ORDER BY ${l2d("s.sv", "b.c_v")} ASC, b.j) AS rn
           |  FROM sv s JOIN $prev b ON s.mi = b.mi) WHERE rn = 1)""".stripMargin
      pq +=
        s"""pm$it AS (SELECT mi, j, CAST(count(*) AS DOUBLE) AS cnt,
           |  list_reduce(list(sv ORDER BY pos),
           |    (a,b) -> list_transform(list_zip(a, b), z -> z[1] + z[2])) AS sm
           |  FROM pa$it GROUP BY mi, j)""".stripMargin
      pq +=
        s"""pq$it AS (SELECT p.mi, p.j,
           |  CASE WHEN m.j IS NULL THEN p.c_v
           |       ELSE list_transform(m.sm, x -> x / m.cnt) END AS c_v
           |  FROM $prev p LEFT JOIN pm$it m ON p.mi = m.mi AND p.j = m.j)""".stripMargin
      prev = s"pq$it"
    }
    pq += s"cb AS MATERIALIZED (SELECT mi, j, c_v, ${sumSq("c_v")} / 2 AS half FROM $prev)"
    pq +=
      s"""codes AS MATERIALIZED (SELECT n_id, mi, j AS code FROM (
         |  SELECT c.n_id, b.mi, b.j,
         |    row_number() OVER (PARTITION BY c.n_id, b.mi
         |      ORDER BY ${ddot(slice("c.n_v", "b.mi"), "b.c_v")} / c.n_n - b.half DESC,
         |        b.j) AS rn
         |  FROM corp c CROSS JOIN cb b) WHERE rn = 1)""".stripMargin
    pq +=
      s"""qp AS MATERIALIZED (SELECT vec_id AS q_id, cell FROM (
         |  SELECT s.vec_id, c.cell,
         |    row_number() OVER (PARTITION BY s.vec_id
         |      ORDER BY ${ddot("s.v", "c.c_v")} / c.nrm DESC, c.cell) AS rn
         |  FROM samp0 s CROSS JOIN cn c WHERE s.vec_id < 10)
         |  WHERE rn <= $nProbe)""".stripMargin
    pq +=
      s"""qtab AS MATERIALIZED (SELECT q.vec_id AS q_id, b.mi, b.j,
         |    ${ddot(slice("q.v", "b.mi"), "b.c_v")} / sqrt(${sumSq("q.v")}) AS tval
         |  FROM (SELECT vec_id, v FROM samp0 WHERE vec_id < 10) q CROSS JOIN cb b)""".stripMargin
    pq +=
      s"""adc AS (SELECT q_id, n_id,
         |    list_reduce(list(tval ORDER BY mi), (a,b) -> a + b) AS adc
         |  FROM (
         |    SELECT p.q_id, c.n_id, t.mi, t.tval
         |    FROM qp p JOIN corp c USING (cell)
         |    JOIN codes k ON k.n_id = c.n_id
         |    JOIN qtab t ON t.q_id = p.q_id AND t.mi = k.mi AND t.j = k.code
         |    WHERE p.q_id != c.n_id)
         |  GROUP BY q_id, n_id)""".stripMargin
    pq +=
      s"""cand AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS r1
         |  FROM adc) WHERE r1 <= ${refine * k})""".stripMargin
    s"""WITH ${trainCtes(nlist, iters, trainSample)},
       |${pq.result().mkString(",\n")}
       |SELECT q_id, n_id, CAST(rank AS BIGINT) AS rank, round(cos, 6) AS cos FROM (
       |  SELECT d.q_id, d.n_id,
       |    ${ddot("qv.v", "c.n_v")} / (sqrt(${sumSq("qv.v")}) * c.n_n) AS cos,
       |    row_number() OVER (PARTITION BY d.q_id
       |      ORDER BY ${ddot("qv.v", "c.n_v")} / (sqrt(${sumSq("qv.v")}) * c.n_n) DESC,
       |        d.n_id) AS rank
       |  FROM cand d JOIN corp c ON c.n_id = d.n_id
       |  JOIN samp0 qv ON qv.vec_id = d.q_id)
       |WHERE rank <= $k""".stripMargin
  }

  /** v8: per-cell FNV keep-threshold sampling (rate = truncating long
    * division, bucket = the t7-shared FNV-1a derivation).
    */
  def v8Sql(perCell: Int, nlist: Int, trainSample: Int = 4096): String = {
    val rate = s"least(1000000::BIGINT, ${perCell.toLong * 1000000L}::BIGINT // s.cell_size)"
    val bucket = TextQueries.fnvSqlPub("('cs|' || CAST(c.n_id AS VARCHAR))")
    s"""WITH ${trainCtes(nlist, iters = 3, trainSample)},
       |sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS cell_size
       |          FROM corp GROUP BY cell)
       |SELECT c.n_id AS vec_id, CAST(c.cell AS BIGINT) AS cell, s.cell_size,
       |  $rate AS rate_ppm,
       |  (CAST($bucket % 1000000 AS BIGINT) < $rate) AS kept
       |FROM corp c JOIN sizes s USING (cell)""".stripMargin
  }
}
