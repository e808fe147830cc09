package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B timing of a runtime SQLConf across queries (r16
  * dev tool) — whole-bench A/B runs drift ±20% on this host, so the
  * only trustworthy comparison alternates the two configurations
  * run-by-run inside ONE JVM and compares per-config minima.
  *
  * Usage:
  *   SPARK_GRAFT_AB_KEY=spark.sql.adaptive.coalescePartitions.minPartitionSize \
  *   SPARK_GRAFT_AB_A=1m SPARK_GRAFT_AB_B=256k \
  *   sbt "runMain graft.AbR16 q1_agg t6_repetition ..."
  */
object AbR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val key = sys.env("SPARK_GRAFT_AB_KEY")
    val va = sys.env("SPARK_GRAFT_AB_A")
    val vb = sys.env("SPARK_GRAFT_AB_B")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    args.foreach { name =>
      def run(v: String): Double = {
        spark.conf.set(key, v)
        val t0 = System.nanoTime()
        mat(SparkEntry.all(name).build(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      // one unmeasured warmup per config (codegen for both plan shapes)
      run(va); run(vb)
      val as = collection.mutable.ArrayBuffer.empty[Double]
      val bs = collection.mutable.ArrayBuffer.empty[Double]
      (1 to rounds).foreach { _ => as += run(va); bs += run(vb) }
      println(f"[ab] $name%-32s A=$va min ${as.min}%6.3f  B=$vb min ${bs.min}%6.3f  " +
        f"delta ${bs.min - as.min}%+6.3f  (A ${as.map(t => f"$t%.2f").mkString(",")} | B ${bs.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
