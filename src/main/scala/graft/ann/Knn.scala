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

  /** IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    * corpus into nlist cells; a query probes only its nProbe nearest
    * cells. Deterministic throughout — centroid init is the first
    * nlist vectors by id, fixed Lloyd iterations, ties broken by
    * cluster id — so results reproduce across runs/executors.
    *
    * Scale: training touches the corpus iters times (map + tiny
    * broadcast of centroids); search is a broadcast of (queries ×
    * probed cells) against a corpus pre-bucketed by cell — the
    * shuffle key is the cell id, and each query scans |corpus|/nlist
    * × nProbe vectors instead of everything.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nlist: Int = 16,
      nProbe: Int = 4,
      iters: Int = 3,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus
      .repartition(spark.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol).as("n_id"), col(vecCol).as("n_v"))
    // deterministic init: first nlist vectors by id. Branch on the
    // element type — vecCol may be array<float> (raw embeddings) or
    // array<double> (anything cast upstream), mirroring DotProduct's
    // mixed-type handling.
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val elemIsFloat = c.schema("n_v").dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    var centroids: Array[(Int, Seq[Double])] = c.orderBy("n_id").limit(nlist)
      .collect().zipWithIndex.map { case (r, i) =>
        i -> (if (elemIsFloat) r.getSeq[Float](1).map(_.toDouble)
              else r.getSeq[Double](1))
      }

    def assign(df: DataFrame, v: String): DataFrame = {
      val cents = spark.createDataFrame(centroids.toSeq).toDF("cell", "c_v")
      val w = W.partitionBy(col("__aid")).orderBy(col("__cos").desc, col("cell"))
      df.withColumn("__aid", col(df.columns.head))
        .crossJoin(broadcast(cents))
        .withColumn("__cos", cosine(col(v), col("c_v")))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .drop("c_v", "__cos", "__rk", "__aid")
    }

    for (_ <- 1 to iters) {
      val assigned = assign(c, "n_v")
      val newCents = assigned
        .select(col("cell"), posexplode(col("n_v")))
        .groupBy("cell", "pos")
        .agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          r => r.getField("m")).as("c_v"))
        .as[(Int, Seq[Double])].collect()
      // empty cells keep their previous centroid
      val byCell = newCents.toMap
      centroids = centroids.map { case (cell, old) =>
        cell -> byCell.getOrElse(cell, old)
      }
    }

    val bucketed = assign(c, "n_v").withColumn("n_n", norm(col("n_v")))
    val cents = spark.createDataFrame(centroids.toSeq).toDF("cell", "c_v")
    val qw = W.partitionBy(col("q_id")).orderBy(col("__cos").desc, col("cell"))
    val probes = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos", cosine(col("q_v"), col("c_v")))
      .withColumn("__rk", row_number().over(qw))
      .filter(col("__rk") <= nProbe)
      .select(col("q_id"), col("q_v"), col("cell"))
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
