package graft

/** OnnxImport: a hand-encoded ONNX ModelProto (protobuf wire format
  * built byte-by-byte here — independent of the reader under test)
  * imports into Score.MlpModel with the exact weights, covering
  * raw_data/float_data/double_data tensor encodings, transB both
  * ways, Relu folding, the strict unsupported-op rejection, and the
  * VPL `.score(model:)` end-to-end binding.
  */
class OnnxImportSpec extends SparkSpec {

  // ---- minimal protobuf writer (mirror of nothing in main code) ----
  private def vint(v: Long): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var x = v
    while ({
      val b = (x & 0x7f).toByte
      x >>>= 7
      if (x != 0) out += (b | 0x80).toByte else out += b
      x != 0
    }) ()
    out.result()
  }
  private def tag(field: Int, wire: Int): Array[Byte] = vint((field << 3) | wire)
  private def ld(field: Int, body: Array[Byte]): Array[Byte] =
    tag(field, 2) ++ vint(body.length) ++ body
  private def str(field: Int, s: String): Array[Byte] = ld(field, s.getBytes("UTF-8"))
  private def iAttr(field: Int, v: Long): Array[Byte] = tag(field, 0) ++ vint(v)
  private def f32le(vs: Seq[Float]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putFloat); bb.array()
  }
  private def f64le(vs: Seq[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putDouble); bb.array()
  }

  /** TensorProto with a chosen encoding: "raw32", "raw64", "f32", "f64" */
  private def tensor(name: String, dims: Seq[Long], vals: Seq[Double],
      enc: String): Array[Byte] = {
    val dimsB = dims.flatMap(d => iAttr(1, d)).toArray
    val body = enc match {
      case "raw32" => iAttr(2, 1) ++ ld(9, f32le(vals.map(_.toFloat)))
      case "raw64" => iAttr(2, 11) ++ ld(9, f64le(vals))
      case "f32"   => iAttr(2, 1) ++ ld(4, f32le(vals.map(_.toFloat)))
      case "f64"   => iAttr(2, 11) ++ ld(10, f64le(vals))
    }
    dimsB ++ body ++ str(8, name)
  }

  private def attrI(name: String, v: Long): Array[Byte] =
    ld(5, str(1, name) ++ iAttr(3, v))
  private def node(op: String, ins: Seq[String], out: String,
      attrs: Array[Byte] = Array.empty): Array[Byte] =
    ld(1, ins.flatMap(str(1, _)).toArray ++ str(2, out) ++ str(4, op) ++ attrs)
  private def graphInput(name: String): Array[Byte] = ld(11, str(1, name))
  private def graphOutput(name: String): Array[Byte] = ld(12, str(1, name))
  private def model(graphFields: Array[Byte]): Array[Byte] = ld(7, graphFields)

  // The demo net: W1 (2 out × 3 in), relu, W2 (1 out × 2 in).
  private val w1 = Seq(0.25, -0.5, 0.125, 0.75, 0.0625, -0.25)
  private val b1 = Seq(0.5, -0.25)
  private val w2 = Seq(0.5, -0.75)
  private val b2 = Seq(0.0625)

  private def refForward(x: Array[Double]): Double = {
    val h = Array(
      math.max(0.25 * x(0) - 0.5 * x(1) + 0.125 * x(2) + 0.5, 0),
      math.max(0.75 * x(0) + 0.0625 * x(1) - 0.25 * x(2) - 0.25, 0))
    val z = 0.5 * h(0) - 0.75 * h(1) + 0.0625
    0.5 + 0.5 * z / (1.0 + math.abs(z))
  }

  test("Gemm[transB=1] -> Relu -> Gemm[transB=0] imports exactly") {
    // layer 1: transB=1, W dims [out=2, in=3], raw float32 + f64 bias
    // layer 2: transB=0, W dims [in=2, out=1] (transposed storage),
    //          packed float_data + raw float64 bias
    val w2T = Seq(w2(0), w2(1)) // [2,1] in-major == same flat order here
    val g =
      graphInput("x") ++
        node("Gemm", Seq("x", "W1", "B1"), "h_pre", attrI("transB", 1)) ++
        node("Relu", Seq("h_pre"), "h") ++
        node("Gemm", Seq("h", "W2", "B2"), "z", attrI("transB", 0)) ++
        ld(5, tensor("W1", Seq(2, 3), w1, "raw32")) ++
        ld(5, tensor("B1", Seq(2), b1, "f64")) ++
        ld(5, tensor("W2", Seq(2, 1), w2T, "f32")) ++
        ld(5, tensor("B2", Seq(1), b2, "raw64"))
    val m = graft.ml.OnnxImport.fromBytes(model(g), "onnx_demo",
      Seq("x1", "x2", "x3"))
    assert(m.layers.length == 2)
    assert(m.layers.head.relu && !m.layers.last.relu)
    assert(m.layers.head.w.map(_.toSeq).toSeq ==
      Seq(Seq(0.25f.toDouble, -0.5f.toDouble, 0.125f.toDouble),
        Seq(0.75f.toDouble, 0.0625f.toDouble, -0.25f.toDouble)))
    assert(m.layers.last.b.toSeq == b2)
    for (x <- Seq(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 7.0),
        Array(0.0, 0.0, 0.0)))
      assert(math.abs(m.forward(x) - refForward(x)) < 1e-7,
        s"${x.toSeq}: ${m.forward(x)} vs ${refForward(x)}")
  }

  test("bias-less Gemm (nn.Linear(bias=False) export) imports as zero bias") {
    val g =
      graphInput("x") ++
        node("Gemm", Seq("x", "W"), "z", attrI("transB", 1)) ++
        ld(5, tensor("W", Seq(1, 2), Seq(0.5, -0.25), "raw32"))
    val m = graft.ml.OnnxImport.fromBytes(model(g), "nobias", Seq("a", "b"))
    assert(m.layers.head.b.toSeq == Seq(0.0))
    val z = 0.5 * 3.0 - 0.25 * 4.0
    assert(m.forward(Array(3.0, 4.0)) == 0.5 + 0.5 * z / (1.0 + math.abs(z)))
  }

  test("truncated weight tensor is rejected with a pointed error") {
    val g =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        ld(5, tensor("W", Seq(2, 2), Seq(1.0, 2.0, 3.0), "raw32")) ++
        ld(5, tensor("B", Seq(2), Seq(0.0, 0.0), "raw32"))
    val e = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(g), "m", Seq("a", "b")))
    assert(e.getMessage.contains("truncated tensor"))
  }

  test("Tanh-hidden + Sigmoid-output chain (the skl2onnx MLPClassifier " +
      "shape) imports and scores bit-equal to a StrictMath recomputation") {
    val g =
      graphInput("x") ++
        node("Gemm", Seq("x", "W1", "B1"), "h_pre", attrI("transB", 1)) ++
        node("Tanh", Seq("h_pre"), "h") ++
        node("Gemm", Seq("h", "W2", "B2"), "z", attrI("transB", 1)) ++
        node("Sigmoid", Seq("z"), "p") ++
        graphOutput("p") ++
        ld(5, tensor("W1", Seq(2, 3), w1, "raw32")) ++
        ld(5, tensor("B1", Seq(2), b1, "f64")) ++
        ld(5, tensor("W2", Seq(1, 2), w2, "f32")) ++
        ld(5, tensor("B2", Seq(1), b2, "raw64"))
    val m = graft.ml.OnnxImport.fromBytes(model(g), "sig",
      Seq("x1", "x2", "x3"))
    assert(m.layers.map(_.act) == Seq("tanh", "sigmoid"))
    def ref(x: Array[Double]): Double = {
      val h = Array(
        StrictMath.tanh(0.25f.toDouble * x(0) + (-0.5f).toDouble * x(1) +
          0.125f.toDouble * x(2) + 0.5),
        StrictMath.tanh(0.75f.toDouble * x(0) + 0.0625f.toDouble * x(1) +
          (-0.25f).toDouble * x(2) + -0.25))
      val z = 0.5f.toDouble * h(0) + (-0.75f).toDouble * h(1) + 0.0625
      // Sigmoid-ended chains keep the network's own calibration —
      // NO extra rational squash on top
      1.0 / (1.0 + StrictMath.exp(-z))
    }
    for (x <- Seq(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 7.0),
        Array(0.0, 0.0, 0.0), Array(100.0, -100.0, 3.25)))
      assert(m.forward(x) == ref(x), // bit-equal, not approx
        s"${x.toSeq}: ${m.forward(x)} vs ${ref(x)}")
    // ...and sigmoid/tanh layers refuse the SQL-oracle path
    val e = intercept[IllegalArgumentException](m.toOracleSql(Seq("a", "b", "c")))
    assert(e.getMessage.contains("not SQL-oracle-able"))
  }

  test("stacked activations and Softmax are rejected, not approximated") {
    val stacked =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        node("Relu", Seq("z"), "r") ++
        node("Sigmoid", Seq("r"), "p") ++
        ld(5, tensor("W", Seq(1, 2), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(stacked), "bad", Seq("a", "b")))
    assert(e.getMessage.contains("already activated"))
    // softmax is TERMINAL-only: a softmax feeding another layer is
    // not a classifier head, reject it
    val midSoftmax =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        node("Softmax", Seq("z"), "p") ++
        node("Gemm", Seq("p", "W2", "B2"), "out", attrI("transB", 1)) ++
        ld(5, tensor("W", Seq(2, 2), Seq(1.0, 2.0, 3.0, 4.0), "raw32")) ++
        ld(5, tensor("B", Seq(2), Seq(0.5, 0.25), "raw32")) ++
        ld(5, tensor("W2", Seq(1, 2), Seq(1.0, 1.0), "raw32")) ++
        ld(5, tensor("B2", Seq(1), Seq(0.0), "raw32"))
    val e2 = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(midSoftmax), "bad", Seq("a", "b")))
    assert(e2.getMessage.contains("final-layer activation only"))
  }

  test("terminal Softmax (3-class skl2onnx head) imports and scores " +
      "bit-equal to a StrictMath recomputation") {
    // 2 inputs -> Relu(3) -> Gemm(3) -> Softmax, axis=1
    val w1 = Seq(0.5, -0.25, 1.0, 0.75, -0.5, 0.125) // 3x2 transB
    val b1 = Seq(0.1, -0.2, 0.3)
    val w2 = Seq(1.0, 0.5, -0.5, -1.0, 0.25, 0.75, 0.0, 2.0, -0.125) // 3x3
    val b2 = Seq(0.05, -0.05, 0.0)
    val g =
      graphInput("x") ++
        node("Gemm", Seq("x", "W1", "B1"), "h_pre", attrI("transB", 1)) ++
        node("Relu", Seq("h_pre"), "h") ++
        node("Gemm", Seq("h", "W2", "B2"), "z", attrI("transB", 1)) ++
        node("Softmax", Seq("z"), "p", attrI("axis", 1)) ++
        graphOutput("p") ++
        ld(5, tensor("W1", Seq(3, 2), w1, "f64")) ++
        ld(5, tensor("B1", Seq(3), b1, "f64")) ++
        ld(5, tensor("W2", Seq(3, 3), w2, "f64")) ++
        ld(5, tensor("B2", Seq(3), b2, "f64"))
    val m = graft.ml.OnnxImport.fromBytes(model(g), "clf", Seq("x1", "x2"))
    assert(m.layers.map(_.act) == Seq("relu", "softmax"))
    assert(m.multiClass)
    def ref(x: Array[Double]): (Array[Double], Int) = {
      val h = (0 until 3).map { o =>
        val s = w1(o * 2) * x(0) + w1(o * 2 + 1) * x(1) + b1(o)
        if (s < 0.0) 0.0 else s
      }
      val z = (0 until 3).map { o =>
        w2(o * 3) * h(0) + w2(o * 3 + 1) * h(1) + w2(o * 3 + 2) * h(2) + b2(o)
      }
      val mx = z.max
      val ex = z.map(v => StrictMath.exp(v - mx))
      val denom = ex(0) + ex(1) + ex(2)
      val probs = ex.map(_ / denom).toArray
      (probs, probs.indexOf(probs.max))
    }
    for (x <- Seq(Array(1.0, 2.0), Array(-3.0, 0.5), Array(0.0, 0.0),
        Array(50.0, -50.0))) {
      val (probs, k) = ref(x)
      assert(m.forwardRaw(x).toSeq == probs.toSeq, // bit-equal
        s"${x.toSeq}: ${m.forwardRaw(x).toSeq} vs ${probs.toSeq}")
      assert(math.abs(probs.sum - 1.0) < 1e-12)
      assert(m.forward(x) == probs(k))
      assert(m.argmax(m.forwardRaw(x)) == k)
    }
    // scoring a frame appends top-class probability AND class index
    import spark.implicits._
    val df = Seq((1.0, 2.0), (-3.0, 0.5)).toDF("x1", "x2")
    val scored = m.score(df).collect()
    scored.foreach { r =>
      val x = Array(r.getDouble(0), r.getDouble(1))
      val (probs, k) = ref(x)
      assert(r.getDouble(2) == probs(k))
      assert(r.getLong(3) == k.toLong)
    }
    // multi-class heads refuse the SQL-oracle path
    val e = intercept[IllegalArgumentException](m.toOracleSql(Seq("a", "b")))
    assert(e.getMessage.contains("not SQL-oracle-able"))
    // and an unsupported softmax axis is rejected loudly
    val badAxis =
      graphInput("x") ++
        node("Gemm", Seq("x", "W1", "B1"), "z", attrI("transB", 1)) ++
        node("Softmax", Seq("z"), "p", attrI("axis", 0)) ++
        ld(5, tensor("W1", Seq(3, 2), w1, "f64")) ++
        ld(5, tensor("B1", Seq(3), b1, "f64"))
    val e3 = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(badAxis), "bad", Seq("a", "b")))
    assert(e3.getMessage.contains("axis"))
  }

  test("MatMul+Add chain imports bit-equal to its Gemm twin") {
    // the skl2onnx/tf2onnx spelling of the SAME demo net: MatMul
    // weights store in-major [nIn, nOut], bias arrives via Add —
    // Add(x, B) on layer 1 and the constant-first Add(B, x) order on
    // layer 2, both of which must fold
    val w1In = Seq(w1(0), w1(3), w1(1), w1(4), w1(2), w1(5)) // [3,2] in-major
    val gMat =
      graphInput("x") ++
        node("MatMul", Seq("x", "W1"), "mm1") ++
        node("Add", Seq("mm1", "B1"), "h_pre") ++
        node("Relu", Seq("h_pre"), "h") ++
        node("MatMul", Seq("h", "W2"), "mm2") ++
        node("Add", Seq("B2", "mm2"), "z") ++
        graphOutput("z") ++
        ld(5, tensor("W1", Seq(3, 2), w1In, "raw32")) ++
        ld(5, tensor("B1", Seq(2), b1, "f64")) ++
        ld(5, tensor("W2", Seq(2, 1), w2, "f32")) ++
        ld(5, tensor("B2", Seq(1), b2, "raw64"))
    val gGemm =
      graphInput("x") ++
        node("Gemm", Seq("x", "W1", "B1"), "h_pre", attrI("transB", 1)) ++
        node("Relu", Seq("h_pre"), "h") ++
        node("Gemm", Seq("h", "W2", "B2"), "z", attrI("transB", 1)) ++
        ld(5, tensor("W1", Seq(2, 3), w1, "raw32")) ++
        ld(5, tensor("B1", Seq(2), b1, "f64")) ++
        ld(5, tensor("W2", Seq(1, 2), w2, "f32")) ++
        ld(5, tensor("B2", Seq(1), b2, "raw64"))
    val mM = graft.ml.OnnxImport.fromBytes(model(gMat), "matmul",
      Seq("x1", "x2", "x3"))
    val mG = graft.ml.OnnxImport.fromBytes(model(gGemm), "gemm",
      Seq("x1", "x2", "x3"))
    assert(mM.layers.map(l => (l.w.map(_.toSeq).toSeq, l.b.toSeq, l.relu)) ==
      mG.layers.map(l => (l.w.map(_.toSeq).toSeq, l.b.toSeq, l.relu)))
    for (x <- Seq(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 7.0),
        Array(0.0, 0.0, 0.0)))
      assert(mM.forward(x) == mG.forward(x)) // bit-equal, not approx
  }

  test("bias-less MatMul imports as zero bias; stray Add is rejected") {
    val g =
      graphInput("x") ++
        node("MatMul", Seq("x", "W"), "z") ++
        ld(5, tensor("W", Seq(2, 1), Seq(0.5, -0.25), "raw32"))
    val m = graft.ml.OnnxImport.fromBytes(model(g), "mm_nobias", Seq("a", "b"))
    assert(m.layers.head.b.toSeq == Seq(0.0))
    // Add anywhere other than right after a MatMul is rejected
    val bad =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        node("Add", Seq("z", "B"), "z2") ++
        ld(5, tensor("W", Seq(1, 2), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(bad), "m", Seq("a", "b")))
    assert(e.getMessage.contains("immediately preceding MatMul"))
  }

  test("branching graphs and walks missing the declared output are rejected") {
    // two nodes consuming the same tensor -> not a single chain
    val branch =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z1", attrI("transB", 1)) ++
        node("Gemm", Seq("x", "W", "B"), "z2", attrI("transB", 1)) ++
        ld(5, tensor("W", Seq(1, 2), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(branch), "m", Seq("a", "b")))
    assert(e.getMessage.contains("consumed by multiple nodes"))
    // chain walk ends at a tensor that is NOT the declared output
    val short =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        graphOutput("y_declared") ++
        ld(5, tensor("W", Seq(1, 2), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e2 = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(short), "m", Seq("a", "b")))
    assert(e2.getMessage.contains("declared"))
  }

  test("an ONNX-file model scores from VPL .score(model:)") {
    import graft.vpl._
    // the registered-query model (loaded once at MlQueries init from
    // its Base64 .onnx bytes) bound into a VPL program — the full
    // reference workflow: export net -> load file -> .score in-stream
    val m = queries.MlQueries.onnxMlp
    val vpl =
      """event Pt:
        |    x1: float
        |    x2: float
        |    x3: float
        |
        |stream S = Pt
        |    .score(model: "onnx_mlp", inputs: [x1, x2, x3])
        |    .emit(p: score)
        |""".stripMargin
    val evt = java.nio.file.Files.createTempFile("graft_onnx", ".evt")
    java.nio.file.Files.writeString(evt,
      """Pt { x1: 1.0, x2: 2.0, x3: 3.0 }
        |Pt { x1: -4.0, x2: 0.5, x3: 0.0 }
        |""".stripMargin)
    val prog = VplParser.parse(vpl)
    val decls = prog.events.map(e => e.name -> e).toMap
    val c = new VplCompiler(prog,
      new EvtSource(spark, Seq(evt.toString), decls),
      models = Map("onnx_mlp" -> m))
    val got = c.stream("S").select("p").collect()
      .map(_.getDouble(0)).sorted
    val want = Seq(m.forward(Array(1.0, 2.0, 3.0)),
      m.forward(Array(-4.0, 0.5, 0.0))).sorted
    assert(got.toSeq == want, got.mkString(","))
  }

  test("a multi-class softmax model scores from VPL .score(model:), " +
      "emitting probability AND class") {
    import graft.vpl._
    import graft.ml.Score.{MlpLayer, MlpModel}
    val m = MlpModel("clf3", Seq("x1", "x2"), Seq(
      MlpLayer(Array(Array(1.0, -1.0), Array(-0.5, 2.0), Array(0.25, 0.5)),
        Array(0.1, -0.1, 0.0), "softmax")))
    val vpl =
      """event Pt:
        |    x1: float
        |    x2: float
        |
        |stream S = Pt
        |    .score(model: "clf3", inputs: [x1, x2])
        |    .emit(p: score, cls: score_class)
        |""".stripMargin
    val evt = java.nio.file.Files.createTempFile("graft_sm", ".evt")
    java.nio.file.Files.writeString(evt,
      """Pt { x1: 3.0, x2: 0.5 }
        |Pt { x1: -1.0, x2: 2.0 }
        |""".stripMargin)
    val prog = VplParser.parse(vpl)
    val decls = prog.events.map(e => e.name -> e).toMap
    val c = new VplCompiler(prog,
      new EvtSource(spark, Seq(evt.toString), decls),
      models = Map("clf3" -> m))
    val got = c.stream("S").select("p", "cls").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    def exp(x: Array[Double]): (Double, Long) = {
      val probs = m.forwardRaw(x)
      val k = m.argmax(probs)
      (probs(k), k.toLong)
    }
    assert(got == Set(exp(Array(3.0, 0.5)), exp(Array(-1.0, 2.0))), s"$got")
    // distinct winning classes so the assertion is not vacuous
    assert(got.map(_._2).size == 2)
  }

  test("input-width mismatch and non-default Gemm attrs are rejected") {
    val ok =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transB", 1)) ++
        ld(5, tensor("W", Seq(1, 2), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(ok), "m", Seq("a", "b", "c")))
    assert(e.getMessage.contains("2 inputs, got 3"))
    val trans =
      graphInput("x") ++
        node("Gemm", Seq("x", "W", "B"), "z", attrI("transA", 1)) ++
        ld(5, tensor("W", Seq(2, 1), Seq(1.0, 2.0), "raw32")) ++
        ld(5, tensor("B", Seq(1), Seq(0.5), "raw32"))
    val e2 = intercept[IllegalArgumentException](
      graft.ml.OnnxImport.fromBytes(model(trans), "m", Seq("a", "b")))
    assert(e2.getMessage.contains("transA=1 unsupported"))
  }
}
