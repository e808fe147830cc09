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
  * }}}
  *
  * Parsed declaratively: text source → regexp columns → running
  * BATCH offset via a last-non-null window over the in-file line
  * order. Field payload lands as a map<string,string>; callers cast
  * fields as their event schema declares (VPL `event` blocks).
  */
object EventFile {

  def read(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("line_no", monotonically_increasing_id())
      .withColumn("line", trim(col("value")))
      .filter(col("line") =!= "" &&
        !col("line").startsWith("#") && !col("line").startsWith("//"))
    val tagged = lines
      .withColumn("batch_ms",
        when(col("line").rlike("^BATCH\\s+[0-9]+$"),
          regexp_extract(col("line"), "^BATCH\\s+([0-9]+)$", 1).cast("long")))
      .withColumn("event_type",
        when(!col("line").startsWith("BATCH"),
          regexp_extract(col("line"), "^([A-Za-z_][A-Za-z0-9_]*)\\s*\\{", 1)))
      .withColumn("body",
        regexp_extract(col("line"), "\\{\\s*(.*?)\\s*\\}$", 1))
    val w = Window.orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("delay_ms",
        coalesce(last(col("batch_ms"), ignoreNulls = true).over(w), lit(0L)))
      .filter(col("event_type").isNotNull && col("event_type") =!= "")
      .withColumn("fields",
        when(col("body") === "", map())
          .otherwise(expr(
            "transform_values(str_to_map(body, ',\\\\s*', ':\\\\s*'), " +
              "(k, v) -> regexp_replace(v, '^\"|\"$', ''))")))
      .select(col("line_no"), col("event_type"), col("delay_ms"), col("fields"))
  }
}
