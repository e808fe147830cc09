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
}
