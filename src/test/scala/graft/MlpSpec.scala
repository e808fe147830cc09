package graft

import org.apache.spark.sql.functions._
import graft.ml.Score

/** Real-MLP scoring seam (Score.MlpModel): hand-computed forward
  * passes, the JSON weight loader, JVM≡SQL arithmetic equality, and
  * the VPL `.score(model:)` binding — the ONNX-shaped capability a
  * scoring user needs, minus only the external runtime.
  */
class MlpSpec extends SparkSpec {

  private val m = queries.MlQueries.demoMlp

  test("hand-computed forward pass") {
    // x = (1, 0, 0): h = relu(W1·x + b1) = relu(0.25+0.5, 0.75-0.25,
    // -0.125+0.125) = (0.75, 0.5, 0)
    // z = 0.5*0.75 - 0.75*0.5 + 0.25*0 + 0.0625 = 0.0625
    // score = 0.5 + 0.5*0.0625/1.0625
    val got = m.forward(Array(1.0, 0.0, 0.0))
    assert(math.abs(got - (0.5 + 0.5 * 0.0625 / 1.0625)) < 1e-15, got)
    // ReLU clamps: x = (-4, 0, 0) -> h = relu(-1+0.5, -3-0.25,
    // 0.5+0.125) = (0, 0, 0.625); z = 0.25*0.625 + 0.0625 = 0.21875
    val got2 = m.forward(Array(-4.0, 0.0, 0.0))
    assert(math.abs(got2 - (0.5 + 0.5 * 0.21875 / 1.21875)) < 1e-15, got2)
  }

  test("JSON weight loader round-trips") {
    val json =
      """{"name":"demo_mlp","inputs":["x1","x2","x3"],"layers":[
        |{"w":[[0.25,-0.5,0.125],[0.75,0.0625,-0.25],[-0.125,0.5,0.375]],
        | "b":[0.5,-0.25,0.125],"act":"relu"},
        |{"w":[[0.5,-0.75,0.25]],"b":[0.0625],"act":"linear"}]}""".stripMargin
    val loaded = Score.MlpModel.fromJson(json)
    assert(loaded.name == m.name && loaded.inputCols == m.inputCols)
    for (x <- Seq(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 7.0)))
      assert(loaded.forward(x) == m.forward(x))
    // sigmoid/tanh (skl2onnx defaults) load since r11 and compute via
    // StrictMath — JVM-deterministic, but NOT SQL-oracle-able
    val tanhModel = Score.MlpModel.fromJson(json.replace("relu", "tanh"))
    assert(tanhModel.layers.head.act == "tanh")
    assert(tanhModel.forward(Array(1.0, 2.0, 3.0)) ==
      0.5 + 0.5 * {
        val h = Array(
          StrictMath.tanh(0.25 - 1.0 + 0.375 + 0.5),
          StrictMath.tanh(0.75 + 0.125 - 0.75 - 0.25),
          StrictMath.tanh(-0.125 + 1.0 + 1.125 + 0.125))
        val z = 0.5 * h(0) - 0.75 * h(1) + 0.25 * h(2) + 0.0625
        z / (1.0 + math.abs(z))
      })
    intercept[IllegalArgumentException](
      tanhModel.toOracleSql(Seq("x1", "x2", "x3")))
    // softmax parses as an activation but only terminally (multi-class
    // head); a hidden softmax is rejected loudly
    val bad = intercept[IllegalArgumentException](Score.MlpModel.fromJson(
      json.replace("relu", "softmax")))
    assert(bad.getMessage.contains("final-layer activation only"))
    val unknown = intercept[IllegalArgumentException](Score.MlpModel.fromJson(
      json.replace("relu", "gelu")))
    assert(unknown.getMessage.contains("unsupported activation"))
  }

  test("JVM forward pass == the model's own generated SQL, bit for bit") {
    val ev = Tables(spark, sf).events.select(
      col("event_id"),
      col("value").as("x1"),
      (col("user_id") % 10).cast("double").as("x2"),
      (col("event_id") % 5).cast("double").as("x3"))
    val viaJvm = m.score(ev).select(col("event_id"), col("score"))
    val sql = m.toOracleSql(Seq("x1", "x2", "x3"))
      .replace("::DOUBLE", "D") // Spark literal syntax
    val viaSql = ev.select(col("event_id"), expr(sql).as("score"))
    // exact equality — no tolerance: the determinism contract
    assert(viaJvm.exceptAll(viaSql).isEmpty &&
      viaSql.exceptAll(viaJvm).isEmpty)
  }

  test("null inputs -> null score in BOTH the JVM path and the generated SQL") {
    // the generated SQL uses a NULL-propagating CASE for ReLU, not
    // greatest(): SQL greatest() IGNORES null arguments
    // (greatest(NULL, 0.0) = 0.0), which would mint a non-null oracle
    // score where the JVM scorer returns null
    val ev = spark.range(2).select(
      col("id").as("event_id"),
      when(col("id") === 0, lit(null).cast("double"))
        .otherwise(lit(1.0)).as("x1"),
      lit(2.0).as("x2"), lit(3.0).as("x3"))
    val viaJvm = m.score(ev).select(col("event_id"), col("score")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val sql = m.toOracleSql(Seq("x1", "x2", "x3")).replace("::DOUBLE", "D")
    val viaSql = ev.select(col("event_id"), expr(sql).as("score")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaJvm(0L).isEmpty, "JVM: null input must score null")
    assert(viaSql(0L).isEmpty, "SQL: null input must score null")
    assert(viaJvm(1L) == viaSql(1L) && viaJvm(1L).nonEmpty)
  }

  test("VPL .score(model:) runs the registered MLP") {
    import graft.vpl._
    val vpl =
      """event Pt:
        |    x1: float
        |    x2: float
        |    x3: float
        |
        |stream S = Pt
        |    .score(model: "demo_mlp", inputs: [x1, x2, x3])
        |    .emit(p: score)
        |""".stripMargin
    val evt = java.nio.file.Files.createTempFile("graft_mlp", ".evt")
    java.nio.file.Files.writeString(evt,
      """Pt { x1: 1.0, x2: 0.0, x3: 0.0 }
        |Pt { x1: -4.0, x2: 0.0, x3: 0.0 }
        |""".stripMargin)
    val prog = VplParser.parse(vpl)
    val decls = prog.events.map(e => e.name -> e).toMap
    val c = new VplCompiler(prog,
      new EvtSource(spark, Seq(evt.toString), decls),
      models = Map("demo_mlp" -> m))
    val got = c.stream("S").select("p").collect()
      .map(_.getDouble(0)).sorted
    val want = Seq(m.forward(Array(-4.0, 0.0, 0.0)),
      m.forward(Array(1.0, 0.0, 0.0))).sorted
    assert(got.toSeq == want, got.mkString(","))
  }
}
