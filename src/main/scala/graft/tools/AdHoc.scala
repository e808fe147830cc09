package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main for plan inspection during builder sessions; not part
  * of the library surface.
  */
object AdHoc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = sys.env.getOrElse("ADHOC_QUERY", "f3_forecast_live")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[adhoc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    spark.range(100000L).selectExpr("sum(id)").collect() // warm
    lap("warm")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    lap("build")
    df.write.format("noop").mode("overwrite").save()
    lap("materialize")
    df.write.format("noop").mode("overwrite").save()
    lap("materialize2")
    spark.stop()
  }
}
