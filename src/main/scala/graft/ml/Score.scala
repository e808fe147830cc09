package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model scoring — the reference's `.score()` operator
  * (crates/varpulis-runtime/src/scoring.rs: per-event ONNX inference
  * over selected input fields).
  *
  * The ONNX runtime is not available in this environment, so the
  * model backends are pluggable and the bundled one is a linear
  * model evaluated as pure column arithmetic — which is also the
  * honest scale shape: scoring must be a per-row map (codegen'd, no
  * shuffle), with batched native inference (ONNX/JNI) slotting in as
  * another [[Model]] without touching the plan. The smooth squash is
  * the rational sigmoid x/(1+|x|) rather than the logistic: it avoids
  * exp(), whose libm rounding differs across engines — keeping the
  * operator bit-reproducible (and SQL-oracle-checkable).
  */
object Score {

  trait Model {
    def name: String
    def inputCols: Seq[String]
    /** append score columns; must be a narrow (map-only) transform */
    def score(df: DataFrame): DataFrame
  }

  /** w·x + b squashed to (0,1) with 0.5 + 0.5·z/(1+|z|). */
  final case class LinearModel(
      name: String,
      weights: Map[String, Double],
      bias: Double,
      outputCol: String = "score") extends Model {

    override def inputCols: Seq[String] = weights.keys.toSeq

    def z: Column = weights.foldLeft(lit(bias)) { case (acc, (c, w)) =>
      acc + col(c) * w
    }

    override def score(df: DataFrame): DataFrame =
      df.withColumn(outputCol, lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)))
  }

  /** Stub for a native-runtime model (the reference's OnnxModel):
    * same interface, mapPartitions batch shape, deterministic fake
    * inference so the plumbing is testable end-to-end.
    */
  final case class StubBatchModel(name: String, inputCols: Seq[String]) extends Model {
    override def score(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val cols = inputCols
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields :+
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType, nullable = false))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      df.mapPartitions { it =>
        // per-partition "session init" is where a real ONNX session loads
        it.map { row =>
          val z = cols.map(c => row.getAs[Any](c) match {
            case d: Double => d
            case l: Long => l.toDouble
            case i: Int => i.toDouble
            case _ => 0.0
          }).sum / 100.0
          org.apache.spark.sql.Row.fromSeq(
            row.toSeq :+ (0.5 + 0.5 * z / (1.0 + math.abs(z))))
        }
      }(enc)
    }
  }
}
