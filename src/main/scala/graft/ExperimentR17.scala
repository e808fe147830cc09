package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.words

/** Round-17 optimization experiments (dev tool, not a driver surface).
  *
  * Experiment "reuse": the r16 verdict's item 1 — replace the
  * unpartitioned-window vocab total (Exchange SinglePartition over an
  * unbounded frame) with a two-level hashed-bucket total — only
  * avoids a SECOND corpus pass if the totals branch's
  * Exchange(hashpartitioning(tok)) is reused against the vocab
  * branch's identical exchange. r16 observed zero ReusedExchange
  * nodes anywhere; this probe measures whether AQE stage reuse fires
  * for exactly this shape in this session config, and at what cost.
  *
  * Usage: sbt "runMain graft.ExperimentR17 reuse"
  */
object ExperimentR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def docs = Tables(spark, sfDir).documents
    def toks = docs.select(col("doc_id"), explode(words(col("text"))).as("tok"))
    def vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))

    // current shape (r16): total rides the vocab frame via an
    // unpartitioned window — ONE task buffers the whole vocab
    def vWindow: DataFrame = vocab
      .withColumn("total", sum(col("cnt"))
        .over(org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)).cast("long"))

    // candidate: two-level hashed-bucket total (partial sums over
    // 4096 deterministic buckets — parallel, corpus-independent
    // size), 1-row broadcast attached back. Depends on exchange
    // reuse to avoid re-running scan+explode+partial-agg.
    def vBucket: DataFrame = {
      val tot = vocab
        .groupBy(pmod(xxhash64(col("tok")), lit(4096)).as("b"))
        .agg(sum(col("cnt")).as("s"))
        .agg(sum(col("s")).as("total"))
      vocab.crossJoin(broadcast(tot))
    }

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

    def profile(name: String, mk: () => DataFrame, n: Int = 4): Unit = {
      var last: DataFrame = null
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val df = mk()
        df.write.format("noop").mode("overwrite").save()
        last = df
        (System.nanoTime() - t0) / 1e9
      }
      val nodes = walk(last.queryExecution.executedPlan)
      val hist = nodes.groupBy(_.getClass.getSimpleName)
        .map { case (k, v) => k -> v.size }.toSeq.sortBy(-_._2)
      println(f"[r17-reuse] $name cold ${times.head}%.2f warm-min ${times.drop(1).min}%.2f s")
      println(s"[r17-reuse] $name nodes: " +
        hist.map { case (k, c) => s"$k=$c" }.mkString(", "))
      val exchanges = nodes.filter(_.getClass.getSimpleName.contains("Exchange"))
      exchanges.foreach(e => println(s"[r17-reuse] $name exchange: " +
        e.toString.linesIterator.next().take(140)))
    }

    args.headOption.getOrElse("reuse") match {
      case "reuse" =>
        profile("vWindow", () => vWindow)
        profile("vBucket", () => vBucket)
        // equality: same rows either way
        val a = vWindow.orderBy("tok").collect()
        val bb = vBucket.orderBy("tok").collect()
        println(s"[r17-reuse] equal=${a.sameElements(bb)} rows=${a.length}")
      case "canon" =>
        // why doesn't reuse fire: compare canonicalized forms of the
        // two hashpartitioning(tok) exchanges in vBucket's initial
        // physical plan
        val df = vBucket
        val plan = df.queryExecution.executedPlan
        def all(p: org.apache.spark.sql.execution.SparkPlan):
            Seq[org.apache.spark.sql.execution.SparkPlan] =
          p +: p.children.flatMap(all)
        val ex = all(plan).collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.toString.contains("tok") => e
        }
        println(s"[r17-canon] found ${ex.length} tok exchanges")
        if (ex.length >= 2) {
          val c0 = ex(0).canonicalized; val c1 = ex(1).canonicalized
          println(s"[r17-canon] equal=${c0 == c1} sameResult=${ex(0).sameResult(ex(1))}")
          if (c0 != c1) {
            val s0 = c0.toString.linesIterator.toSeq
            val s1 = c1.toString.linesIterator.toSeq
            s0.zipAll(s1, "<none>", "<none>").filter(p => p._1 != p._2)
              .take(10).foreach { case (l, r) =>
                println(s"[r17-canon] A: $l")
                println(s"[r17-canon] B: $r")
              }
            if (s0 == s1) println("[r17-canon] string-identical but != — " +
              "object inequality below the string level")
          }
        }
        // and the same question for a pure-builtin shape
        val base = spark.range(1000000L)
          .selectExpr("id % 1000 AS k", "id AS v")
        val agg = base.groupBy("k").agg(sum("v").as("s"))
        val tot2 = agg.agg(sum("s").as("t"))
        val j = agg.crossJoin(broadcast(tot2))
        j.write.format("noop").mode("overwrite").save()
        val nodes2 = walk(j.queryExecution.executedPlan)
        println(s"[r17-canon] builtin shape nodes: " +
          nodes2.groupBy(_.getClass.getSimpleName)
            .map { case (k, v) => s"$k=${v.size}" }.mkString(", "))
      case "canon2" =>
        def mk(): DataFrame = {
          val base = spark.range(1000000L)
            .selectExpr("id % 1000 AS k", "id AS v")
          val agg = base.groupBy("k").agg(sum("v").as("s"))
          val tot2 = agg.agg(sum("s").as("t"))
          agg.crossJoin(broadcast(tot2))
        }
        // logical-level sameResult between the two agg instances
        val base = spark.range(1000000L)
          .selectExpr("id % 1000 AS k", "id AS v")
        val agg1 = base.groupBy("k").agg(sum("v").as("s"))
        val agg2 = base.groupBy("k").agg(sum("v").as("s"))
        println(s"[r17-canon2] logical sameResult=" +
          agg1.queryExecution.optimizedPlan.sameResult(
            agg2.queryExecution.optimizedPlan))
        for (aqe <- Seq("true", "false")) {
          spark.conf.set("spark.sql.adaptive.enabled", aqe)
          val j = mk()
          j.write.format("noop").mode("overwrite").save()
          val s = j.queryExecution.executedPlan.toString
          val reused = s.linesIterator.count(_.contains("ReusedExchange")) +
            s.linesIterator.count(_.contains("reuses"))
          println(s"[r17-canon2] aqe=$aqe ReusedExchange-ish lines=$reused")
          println(s.linesIterator.take(30).map("[r17-plan] " + _).mkString("\n"))
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      case other => sys.error(s"unknown experiment: $other")
    }
    spark.stop()
  }
}
