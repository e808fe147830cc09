package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `.evt` event-file reader — the reference's test-injection format
  * (crates/varpulis-runtime/src/event_file.rs, itself modeled on
  * Apama's .evt):
  *
  * {{{
  * # comment            // comment
  * StockTick { symbol: "AAPL", price: 150.0 }
  * BATCH 100            # later events delayed 100ms from start
  * Order { id: 1 }
  * @2s Event { x: 1 }   # absolute event time: 2s from start
  * }}}
  *
  * Parsed declaratively: text source → regexp columns → running
  * BATCH offset via a last-non-null window over the in-file line
  * order. Field payload lands as a map<string,string> twice: `fields`
  * (quotes stripped — ready to use) and `fields_raw` (literal text —
  * `"x"` vs `1` vs `1.0` lets [[graft.vpl.VplCompiler]] infer types
  * for undeclared events exactly as the reference's dynamic payloads
  * behave). Callers cast fields as their event schema declares (VPL
  * `event` blocks).
  *
  * CONTRACT — replay scripts only, NOT a data path. The running
  * BATCH-offset carry is a global `Window.orderBy(line_no)`
  * (single-partition by construction): correct and cheap for the
  * KB-scale .evt test-injection scripts this format exists for, and
  * wrong for bulk data — bulk ingestion goes through the parquet/
  * json/csv [[FileConnector]] sources. [[maxScriptBytes]] enforces
  * the contract: any input over 64 MiB fails fast with a pointer at
  * the right source, so the single-partition window can never be
  * reached by a data-scale path.
  */
object EventFile {

  /** Hard cap on total .evt input size — see the class contract. */
  val maxScriptBytes: Long = 64L * 1024 * 1024

  private val unitUs: Map[String, Long] = Map(
    "ns" -> 1L, "us" -> 1L, "ms" -> 1000L, "s" -> 1000000L,
    "m" -> 60000000L, "h" -> 3600000000L, "d" -> 86400000000L)

  def read(spark: SparkSession, path: String): DataFrame = read(spark, Seq(path))

  /** Multi-file read (e.g. checkpoint phase1 + phase2): files are
    * concatenated in argument order, later files' events ordered after
    * earlier ones (the reference's restart-and-continue replay).
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    // replay-scripts-only guard: fail fast before building the
    // single-partition plan (driver-side stat, no job)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val total = paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }.sum
    require(total <= maxScriptBytes,
      s".evt input is $total bytes (cap $maxScriptBytes): EventFile is " +
        "for KB-scale replay scripts (single-partition BATCH carry); " +
        "bulk data belongs in a parquet/json/csv FileConnector")
    val perFile = paths.zipWithIndex.map { case (p, idx) =>
      readOne(spark, p)
        .withColumn("line_no", col("line_no") + lit(idx.toLong * 1000000000L))
    }
    perFile.reduce(_.unionByName(_))
  }

  /** `@([0-9]+)(unit)` prefix → microseconds, as native columns (no UDF). */
  private def atMicros(value: org.apache.spark.sql.Column,
      unit: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unitUs.foldLeft(lit(null).cast("long")) { case (acc, (u, mult)) =>
      when(unit === u, value * mult).otherwise(acc)
    }

  private def readOne(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("line_no", monotonically_increasing_id())
      .withColumn("line", trim(col("value")))
      .filter(col("line") =!= "" &&
        !col("line").startsWith("#") && !col("line").startsWith("//"))
    val tagged = lines
      .withColumn("batch_ms",
        when(col("line").rlike("^BATCH\\s+[0-9]+$"),
          regexp_extract(col("line"), "^BATCH\\s+([0-9]+)$", 1).cast("long")))
      // `@2s EventType {...}` — absolute per-event time prefix
      .withColumn("at_val",
        regexp_extract(col("line"), "^@([0-9]+)(ns|us|ms|s|m|h|d)\\s+", 1))
      .withColumn("at_unit",
        regexp_extract(col("line"), "^@([0-9]+)(ns|us|ms|s|m|h|d)\\s+", 2))
      .withColumn("eline",
        when(col("at_val") =!= "",
          regexp_replace(col("line"), "^@[0-9]+(?:ns|us|ms|s|m|h|d)\\s+", ""))
          .otherwise(col("line")))
      .withColumn("event_type",
        when(!col("eline").startsWith("BATCH"),
          regexp_extract(col("eline"), "^([A-Za-z_][A-Za-z0-9_]*)\\s*\\{", 1)))
      .withColumn("body",
        regexp_extract(col("eline"), "\\{\\s*(.*?)\\s*\\}$", 1))
    val w = Window.orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("delay_ms",
        when(col("at_val") =!= "",
          (atMicros(col("at_val").cast("long"), col("at_unit")) / 1000L).cast("long"))
          .otherwise(
            coalesce(last(col("batch_ms"), ignoreNulls = true).over(w), lit(0L))))
      .filter(col("event_type").isNotNull && col("event_type") =!= "")
      .withColumn("fields_raw",
        when(col("body") === "", map())
          .otherwise(expr("str_to_map(body, ',\\\\s*', ':\\\\s*')")))
      .withColumn("fields",
        expr("transform_values(fields_raw, (k, v) -> regexp_replace(v, '^\"|\"$', ''))"))
      .select(col("line_no"), col("event_type"), col("delay_ms"),
        col("fields"), col("fields_raw"))
  }
}
