package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+ (bench). At
  * cluster scale these would be external tables; the API is identical.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def lineitem: DataFrame  = table("lineitem")
  def orders: DataFrame    = table("orders")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def nation: DataFrame    = table("nation")
  def region: DataFrame    = table("region")
  def events: DataFrame    = Tables.normalizeTs(table("events"))
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** The events table stores ns-precision timestamps, which Spark's
    * parquet reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[session]]) so
    * `ts` arrives as a ns-epoch long, converted here to a µs
    * timestamp (floor division — matches DuckDB's `epoch_us` on the
    * same values, so oracle time arithmetic agrees exactly).
    */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.find(_.name == tsCol) match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn(tsCol, timestamp_micros(expr(s"$tsCol div 1000")))
      case _ => df
    }

  /** Session config every entry point (Verify/Bench/tests) applies. */
  val sessionConfs: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")
}
