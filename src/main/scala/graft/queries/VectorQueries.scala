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

    // --- #41 LSH-bucketed ANN (scale path; spec checks recall vs v1) ---
    "v3_knn_lsh" -> QueryDef.rowsOnly {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.lshTopK(e, e.filter(col("vec_id") < 10), k = 10, nBits = 4)
      }
    },

    // --- #41b IVF ANN: k-means cells + nProbe search (scale path) ---
    "v4_knn_ivf" -> QueryDef.rowsOnly {
      (s, dir) => {
        val e = Tables(s, dir).embeddings
        Knn.ivfTopK(e, e.filter(col("vec_id") < 10), k = 10,
          nlist = 16, nProbe = 4)
      }
    })
}
