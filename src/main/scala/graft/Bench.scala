package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark entry point (driver contract): times every registered
  * query at SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: a short warmup (JIT + parquet reader + codegen paths)
  * runs before timing, and results are materialized through the
  * `noop` sink — `count()` would let Catalyst prune the computed
  * columns of map-only queries and under-report their real cost.
  *
  * Failures are NOT swallowed into normal-looking timings: a query
  * whose build or execution throws is reported with value -1 and an
  * entry in the `errors` map, so a regression shows up as a failure
  * rather than a fast bench entry.
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

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: exercise codegen, shuffle and the parquet reader once
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try materialize(SparkEntry.queries("q1_agg")(spark, sfDir))
    catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { materialize(SparkEntry.queries(name)(spark, sfDir)); true }
        catch {
          case t: Throwable =>
            // strip everything JSON can't carry unescaped: quote,
            // backslash, and ALL control chars (u0000-u001f)
            errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName)
              .replaceAll("[\"\\\\\\p{Cntrl}]", " ").take(200)
            false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    def jstr(s: String) = "\"" + s + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }
}
