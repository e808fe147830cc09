package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch A/B experiment runner for the r16 optimization round (dev
  * tool): times named queries under optional session-conf overrides.
  *
  * Usage:
  *   SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.minPartitionSize=64k;spark.x=y" \
  *   sbt "runMain graft.ExperimentR16 f5_conformal w7_analytics"
  */
object ExperimentR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "4").toInt
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        mat(SparkEntry.all(name).build(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[exp] $name%-32s min ${ts.min}%6.3f s  runs ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
