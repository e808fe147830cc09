package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling entry point (dev tool; not part of the driver
  * contract). Times plan stages for the currently-slow queries.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables(spark, sfDir).documents
    import graft.functions.TextFunctions._
    val par = spark.sparkContext.defaultParallelism
    val fanned = docs.repartition(par, col("doc_id"))
    time("force_norm")(
      fanned.agg(sum(length(normalize(col("text"))))).head.getLong(0))
    time("force_words")(
      fanned.agg(sum(size(words(col("text"))))).head.getLong(0))
    time("force_shingles")(
      fanned.agg(sum(size(shingles(col("text"), 3)))).head.getLong(0))
    time("explode_words")(
      fanned.select(explode(words(col("text")))).count())
    time("explode_shingles")(
      fanned.select(explode(shingles(col("text"), 3))).count())
    val pre = fanned.select(col("doc_id"), col("lang"),
      shingles(col("text"), 3).as("sh"))
    time("explode_precomputed")(
      pre.select(col("doc_id"), explode(col("sh"))).count())
    val base = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"), col("lang"), shingles(col("text"), 3).as("sh"))
      .withColumn("n", size(col("sh")))
    val postings = base.select(col("doc_id"), col("n"), col("lang"),
      explode(col("sh")).as("s"))
    time("postings_fanned")(postings.count())
    time("postings_fanned2")(postings.count())
    val a = postings.select(col("s"), col("lang"), col("doc_id").as("a_id"), col("n").as("a_n"))
    val bb = postings.select(col("s"), col("lang"), col("doc_id").as("b_id"), col("n").as("b_n"))
    val joined = a.join(bb, Seq("s", "lang")).filter(col("a_id") < col("b_id"))
    time("joined_fanned")(joined.count())
    val shared = joined
      .groupBy("a_id", "b_id", "a_n", "b_n").agg(count(lit(1)).as("inter"))
    time("shared_fanned")(shared.count())
    val sigbase = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))
      .withColumn("sig", graft.dedup.Dedup.minhashSig(col("sh"), 16))
    time("minhash_sig")(sigbase.count())
    time("full_d2")(SparkEntry.all("d2_ngram_jaccard").build(spark, sfDir).count())
    time("d3_lsh")(SparkEntry.all("d3_minhash_lsh").build(spark, sfDir).count())
    spark.stop()
  }
}
