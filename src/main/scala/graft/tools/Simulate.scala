package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.HvacSimulator

/** CLI twin of `varpulis simulate` (varpulis-cli main; simulator
  * scenarios from varpulis-runtime/src/simulator.rs): generate the
  * HVAC demo event stream, either bounded to parquet (demo corpus /
  * replay staging) or live to the console sink.
  *
  * Usage:
  *   runMain graft.tools.Simulate [options]
  *     --scenario S     default | anomaly | degradation
  *     --ticks N        bounded batch of N ticks -> --out (default 1000)
  *     --out DIR        parquet output dir (default target/hvac_sim)
  *     --live           stream to console at events_per_second instead
  *     --rate N         override events_per_second
  *     --seed N         reproducible draw seed (default 0)
  */
object Simulate {
  def main(args: Array[String]): Unit = {
    // --live is valueless: a pairwise slide would misalign every
    // option after it, silently dropping them
    def parse(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case "--live" :: tail => parse(tail, acc + ("live" -> "1"))
        case flag :: v :: tail if flag.startsWith("--") && !v.startsWith("--") =>
          parse(tail, acc + (flag.drop(2) -> v))
        case other :: _ =>
          System.err.println(s"bad argument '$other' — usage: " +
            "[--scenario S] [--ticks N] [--out DIR] [--live] [--rate N] [--seed N]")
          sys.exit(2)
      }
    val opts = parse(args.toList, Map.empty)
    val base = opts.getOrElse("scenario", "default") match {
      case "default"     => HvacSimulator.defaultConfig
      case "anomaly"     => HvacSimulator.anomalyConfig
      case "degradation" => HvacSimulator.degradationConfig
      case other =>
        System.err.println(s"unknown scenario '$other' " +
          "(default | anomaly | degradation)")
        sys.exit(2)
    }
    val cfg = base.copy(
      eventsPerSecond = opts.get("rate").map(_.toInt)
        .getOrElse(base.eventsPerSecond),
      seed = opts.get("seed").map(_.toLong).getOrElse(base.seed))

    val b = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-simulate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (opts.contains("live")) {
      val q = HvacSimulator.stream(spark, cfg)
        .writeStream.format("console").option("truncate", "false").start()
      q.awaitTermination()
    } else {
      val n = opts.get("ticks").map(_.toLong).getOrElse(1000L)
      val out = opts.getOrElse("out", "target/hvac_sim")
      HvacSimulator.ticks(spark, n, cfg)
        .write.mode("overwrite").parquet(out)
      println(s"[simulate] ${spark.read.parquet(out).count()} events " +
        s"(${opts.getOrElse("scenario", "default")}, $n ticks) -> $out")
    }
    spark.stop()
  }
}
