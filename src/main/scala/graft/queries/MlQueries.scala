package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Score

/** Model-scoring surface (reference `.score()`, scoring.rs). */
object MlQueries {

  /** Demo MLP (3→3 ReLU→1): dyadic-rational weights, so every
    * literal parses to the identical double on both engines and the
    * JVM forward pass reproduces the SQL arithmetic bit for bit —
    * real neural-net inference under the hash gate.
    */
  val demoMlp: Score.MlpModel = Score.MlpModel(
    name = "demo_mlp",
    inputCols = Seq("x1", "x2", "x3"),
    layers = Seq(
      Score.MlpLayer(
        Array(Array(0.25, -0.5, 0.125),
          Array(0.75, 0.0625, -0.25),
          Array(-0.125, 0.5, 0.375)),
        Array(0.5, -0.25, 0.125), relu = true),
      Score.MlpLayer(
        Array(Array(0.5, -0.75, 0.25)),
        Array(0.0625), relu = false)))

  /** A 3→2-ReLU→1 net shipped as an actual ONNX ModelProto (Base64
    * of the 198-byte protobuf; Gemm transB=1 like nn.Linear exports,
    * weights across raw_data/float_data/double_data encodings) and
    * imported through [[graft.ml.OnnxImport]] — the reference's model
    * FORMAT (scoring.rs loads .onnx files), parsed with graft's
    * dependency-free wire reader. Weights are dyadic rationals, so
    * the f32 round-trip is exact and the imported model sits under
    * the same generated-SQL hash oracle as m4.
    */
  val onnxMlp: Score.MlpModel = graft.ml.OnnxImport.fromBytes(
    java.util.Base64.getDecoder.decode(
      "OsMBWgMKAXgKJAoBeAoCVzEKAkIxEgVoX3ByZSIER2VtbSoKCgZ0cmFuc0IYAQoQCgVoX" +
        "3ByZRIBaCIEUmVsdQogCgFoCgJXMgoCQjISAXoiBEdlbW0qCgoGdHJhbnNCGAEqJAgC" +
        "CAMQAUoYAAAAPwAAgL4AAAA+AABAvwAAwD4AAIA9QgJXMSoSCAIQAUoIAACAPgAAAL9" +
        "CAkIxKhQIAQgCEAEiCAAAID8AAMC+QgJXMioSCAEQC1IIAAAAAAAAwD9CAkIy"),
    name = "onnx_mlp", inputCols = Seq("x1", "x2", "x3"))

  val defs: Map[String, QueryDef] = Map(

    // --- .score(): linear model over event fields, rational sigmoid ---
    "m2_score" -> QueryDef.of(
      """SELECT event_id,
        | 0.5 + 0.5 * (-0.8::DOUBLE + value * 0.01::DOUBLE) /
        |   (1.0::DOUBLE + abs(-0.8::DOUBLE + value * 0.01::DOUBLE)) AS score
        |FROM events""".stripMargin) {
      (s, dir) =>
        Score.LinearModel("risk", Map("value" -> 0.01), bias = -0.8)
          .score(Tables(s, dir).events)
          .select("event_id", "score")
    },

    // --- .score() with a REAL MLP (scoring.rs ONNX seam): JVM
    // forward pass in mapPartitions, oracle = the model's own
    // generated SQL arithmetic (toOracleSql) — the hash gate checks
    // genuine NN inference, not a stand-in ---
    "m4_mlp_score" -> QueryDef.of(
      s"""SELECT event_id, user_id,
         | ${demoMlp.toOracleSql(Seq("value",
             "CAST(user_id % 10 AS DOUBLE)",
             "CAST(event_id % 5 AS DOUBLE)"))} AS score
         |FROM events""".stripMargin) {
      (s, dir) => {
        val ev = Tables(s, dir).events.select(
          col("event_id"), col("user_id"),
          col("value").as("x1"),
          (col("user_id") % 10).cast("double").as("x2"),
          (col("event_id") % 5).cast("double").as("x3"))
        demoMlp.score(ev)
          .select(col("event_id"), col("user_id"), col("score"))
      }
    },

    // --- .score() with a model imported FROM AN ONNX FILE (the
    // reference's actual model format): the wire-format reader
    // (OnnxImport) feeds the same JVM forward pass and the same
    // generated-SQL oracle — ONNX-shaped scoring end to end under
    // the hash gate, no external runtime ---
    "m5_onnx_score" -> QueryDef.of(
      s"""SELECT event_id,
         | ${onnxMlp.toOracleSql(Seq("value",
             "CAST(user_id % 10 AS DOUBLE)",
             "CAST(event_id % 5 AS DOUBLE)"))} AS score
         |FROM events""".stripMargin) {
      (s, dir) => {
        val ev = Tables(s, dir).events.select(
          col("event_id"),
          col("value").as("x1"),
          (col("user_id") % 10).cast("double").as("x2"),
          (col("event_id") % 5).cast("double").as("x3"))
        onnxMlp.score(ev).select(col("event_id"), col("score"))
      }
    })
}
