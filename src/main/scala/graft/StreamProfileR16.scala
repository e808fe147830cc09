package graft

import org.apache.spark.sql.SparkSession

/** Phase-level timing of streaming queries (r16 dev tool): runs a
  * named streaming query N times and reports wall per run, with the
  * first run absorbing the staging + codegen warmth. Compares
  * checkpoint-on-disk vs checkpoint-on-tmpfs when asked.
  */
object StreamProfileR16 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass streaming query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "4").toInt
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_LOCAL_DIR_OVERRIDE").foreach { d =>
      b.config("spark.local.dir", d)
    }
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
        }
      })
    args.foreach { name =>
      val ts = (1 to n).map { i =>
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        SparkEntry.all(name).build(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[sprof] $name run $i: wall $w%6.2f s  jobs ${jobs.get}%3d " +
          f"stages ${stages.get}%3d tasks ${tasks.get}%4d")
        w
      }
      println(f"[sprof] $name: cold ${ts.head}%.2f s, warm min ${ts.drop(1).min}%.2f s")
    }
    spark.stop()
  }
}
