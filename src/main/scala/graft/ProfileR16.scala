package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.LongAdder

/** Round-16 optimization profiler (dev tool, not a driver surface).
  *
  * For each named query: materializes through the noop sink N times
  * (first run = cold codegen, min of rest = warm floor), then prints
  * the FINAL adaptive executed plan — AQE stage reuse is invisible in
  * pre-execution explain, so exchange/scan counts must come from the
  * executed tree. Also tallies task time and GC across the run.
  *
  * Usage: sbt "runMain graft.ProfileR16 t17_lm_fluency [more...]"
  *        SPARK_GRAFT_PROFILE_N=3 to change repeats; PLAN=1 dumps the
  *        full final plan text.
  */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_PROFILE_N", "3").toInt
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskTime = new LongAdder; val gcTime = new LongAdder
    val stages = new LongAdder; val tasks = new LongAdder
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.increment()
        tasks.add(e.stageInfo.numTasks.toLong)
        taskTime.add(e.stageInfo.taskMetrics.executorRunTime)
        gcTime.add(e.stageInfo.taskMetrics.jvmGCTime)
        val si = e.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield (c - s) / 1e3).getOrElse(-1.0)
        stageLog.add(
          f"    stage ${si.stageId}%3d tasks ${si.numTasks}%4d " +
            f"wall $wall%6.2f s run ${si.taskMetrics.executorRunTime / 1e3}%6.2f s " +
            f"cpu ${si.taskMetrics.executorCpuTime / 1e9}%6.2f s " +
            f"gc ${si.taskMetrics.jvmGCTime / 1e3}%5.2f s  " +
            si.name.take(90))
      }
    })
    // shared JIT warmup so the first profiled query isn't charged for it
    spark.range(1000000L).selectExpr("sum(id)").collect()
    args.foreach { name =>
      val times = (1 to n).map { i =>
        taskTime.reset(); gcTime.reset(); stages.reset(); tasks.reset()
        stageLog.clear()
        // time build() + save like Bench.timeOne does — iterative
        // trainers (BPE, Lloyd) run driver-side actions inside build
        val t0 = System.nanoTime()
        val df = SparkEntry.all(name).build(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name run $i: wall $wall%6.2f s  " +
          f"stages ${stages.sum}%3d  tasks ${tasks.sum}%5d  " +
          f"taskTime ${taskTime.sum / 1e3}%7.2f s  gc ${gcTime.sum / 1e3}%5.2f s")
        (wall, df)
      }
      val warm = times.drop(1).map(_._1) :+ times.last._1
      println(f"[profile] $name: cold ${times.head._1}%.2f s, warm min ${warm.min}%.2f s")
      if (sys.env.contains("STAGES")) {
        println(s"[profile] $name last-run stages:")
        stageLog.forEach(l => println(l))
      }
      val executed = times.last._2.queryExecution.executedPlan
      // the final adaptive tree: collect node class names incl. reuse
      def walk(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: walk(q.plan)
        case other =>
          other +: (other.children.flatMap(walk) ++
            other.subqueries.flatMap(walk))
      }
      val nodes = walk(executed)
      val hist = nodes.groupBy(_.getClass.getSimpleName)
        .map { case (k, v) => k -> v.size }.toSeq.sortBy(-_._2)
      println(s"[profile] $name final-plan nodes: " +
        hist.map { case (k, c) => s"$k=$c" }.mkString(", "))
      if (sys.env.contains("PLAN"))
        println(executed.toString().take(12000))
    }
    spark.stop()
  }
}
