package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.{Failure, Success}

/** CLI runner for VPL programs — the `varpulis run program.vpl`
  * equivalent (reference: crates/varpulis-cli). Compiles every stream
  * of the program to a Spark plan and executes it over the chosen
  * source, so a program written for the reference engine runs
  * unmodified on a Spark cluster.
  *
  * Usage (via sbt or spark-submit):
  *   runMain graft.tools.RunVpl program.vpl [options]
  *     --evt a.evt[,b.evt]   run over timed .evt event file(s)
  *     --table-dir DIR       run over the parquet events table in DIR
  *     --stream NAME         only this stream (default: all streams)
  *     --streaming           Structured-Streaming mode over the .evt
  *                           timed replay (requires --evt + --stream)
  *     --out DIR             write each stream's result as parquet
  *                           under DIR/<stream>; default prints a
  *                           20-row preview + count
  *     --master M            Spark master (default local[*])
  */
object RunVpl {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println(usage); sys.exit(2) }
    val vplPath = args(0)
    val opts =
      try parseOpts(args.drop(1).toList)
      catch { case e: IllegalArgumentException => fail(e.getMessage) }
    val vplText = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(vplPath)),
      "UTF-8")

    val builder = SparkSession.builder()
      .master(opts.getOrElse("master", "local[*]"))
      .appName(s"graft-vpl ${new java.io.File(vplPath).getName}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results =
      try plan(spark, vplText, opts)
      catch { case e: IllegalArgumentException => fail(e.getMessage) }

    var failed = 0
    results.sortBy(_._1).foreach {
      case (name, Success(df)) =>
        opts.get("out") match {
          case Some(out) =>
            df.write.mode("overwrite").parquet(s"$out/$name")
            // count the WRITTEN parquet — counting `df` would
            // re-execute the whole plan a second time
            val n = spark.read.parquet(s"$out/$name").count()
            println(s"[$name] $n rows -> $out/$name")
          case None =>
            println(s"=== $name (${df.count()} rows) ===")
            df.show(20, truncate = false)
        }
      case (name, Failure(e)) =>
        failed += 1
        System.err.println(s"[$name] FAILED: ${e.getMessage}")
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** The CLI's planning core, separated from main() so the spec
    * harness can drive the exact CLI path (same option map, same
    * mode dispatch) inside a shared test session. Throws
    * IllegalArgumentException on invalid option combinations.
    */
  private[tools] def plan(spark: SparkSession, vplText: String,
      opts: Map[String, String])
      : Seq[(String, scala.util.Try[org.apache.spark.sql.DataFrame])] = {
    import graft.vpl.Vpl
    val only = opts.get("stream")
    def need(key: String, msg: String): String =
      opts.getOrElse(key, throw new IllegalArgumentException(msg))
    if (opts.contains("streaming")) {
      val evt = need("evt", "--streaming requires --evt FILE")
      val name = only.getOrElse(
        throw new IllegalArgumentException("--streaming requires --stream NAME"))
      Seq(name -> scala.util.Try(
        Vpl.runEvtStreaming(spark, vplText, evt, name)))
    } else if (opts.contains("evt")) {
      val paths = opts("evt").split(",").map(_.trim).filter(_.nonEmpty)
      Vpl.runEvt(spark, vplText, paths.toSeq).toSeq
        .filter { case (n, _) => only.forall(_ == n) }
    } else {
      val dir = need("table-dir", "need --evt FILE or --table-dir DIR")
      val prog = graft.vpl.VplParser.parse(vplText)
      val names = only.map(Seq(_)).getOrElse(prog.streams.map(_.name))
      names.map(n => n -> scala.util.Try(
        Vpl.tableStream(spark, dir, vplText, n)))
    }
  }

  private[tools] def parseOptsForTest(rest: List[String]): Map[String, String] =
    parseOpts(rest)

  private def fail(msg: String): Nothing = {
    System.err.println(msg); System.err.println(usage); sys.exit(2)
  }

  private val usage =
    """usage: RunVpl program.vpl [--evt a.evt[,b.evt] | --table-dir DIR]
      |              [--stream NAME] [--streaming] [--out DIR] [--master M]""".stripMargin

  private def parseOpts(rest: List[String],
      acc: Map[String, String] = Map.empty): Map[String, String] = rest match {
    case Nil => acc
    case "--streaming" :: tail => parseOpts(tail, acc + ("streaming" -> "1"))
    case flag :: v :: tail if flag.startsWith("--") && !v.startsWith("--") =>
      parseOpts(tail, acc + (flag.drop(2) -> v))
    case flag :: _ if flag.startsWith("--") =>
      // value-taking flag followed by another flag (or nothing):
      // consuming the next flag as a value silently drops options
      throw new IllegalArgumentException(s"missing value for $flag")
    case other :: _ =>
      throw new IllegalArgumentException(s"unrecognized argument: $other")
  }
}
