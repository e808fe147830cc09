package graft.ml

import graft.ml.Score.{MlpLayer, MlpModel}

/** Import an ONNX feed-forward network into [[Score.MlpModel]] — the
  * bridge from the reference's model format (scoring.rs runs `.score`
  * over ONNX files) into graft's deterministic JVM scorer, with NO
  * runtime or protobuf dependency: ONNX files are protobuf messages
  * (an open, stable wire format), and the subset an MLP needs —
  * varints, length-delimited submessages, packed float/double
  * tensors — is a ~100-line strict reader.
  *
  * Supported graph shape: a single chain
  * `input → Gemm [→ act] → … → Gemm [→ act]` with one final output
  * unit (exactly [[MlpModel]]'s shape; nn.Linear exports as Gemm with
  * transB=1), or the MatMul[→Add][→act] spelling of the same layer
  * (skl2onnx/tf2onnx frequently emit MatMul+Add instead of Gemm —
  * the pair folds into a Gemm-equivalent layer, a bare MatMul into a
  * zero-bias one). Activations: Relu, Sigmoid and Tanh (the skl2onnx
  * MLPClassifier defaults), computed via StrictMath (fdlibm —
  * bit-identical on every JVM), plus — since r12 — a TERMINAL Softmax
  * (the other common skl2onnx classifier ending): multi-class
  * probabilities via max-subtracted StrictMath.exp, scored as the
  * top class's probability + its index (`score`, `score_class`).
  * Each Gemm must have alpha=1, beta=1, transA=0 (the PyTorch/sklearn
  * export default); weights may arrive as float_data, double_data or
  * raw_data in float32/float64. Anything else (branching graphs,
  * stacked activations, non-terminal Softmax) is REJECTED with a
  * pointed error rather than silently approximated. Output
  * calibration: a chain ending in linear/Relu squashes through
  * graft's deterministic rational sigmoid 0.5 + 0.5·z/(1+|z|) (the
  * SQL-oracle-able contract used by m5); a chain ending in Sigmoid/
  * Tanh/Softmax keeps its own calibration and is scored on the JVM
  * path only (libm exp() is not bit-reproducible across SQL engines).
  */
object OnnxImport {

  // ---- protobuf wire reader (strict subset) -------------------------

  private final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        require(pos < end, "onnx: truncated varint")
        val b = buf(pos); pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "onnx: truncated fixed32")
      val v = (buf(pos) & 0xff) | (buf(pos + 1) & 0xff) << 8 |
        (buf(pos + 2) & 0xff) << 16 | (buf(pos + 3) & 0xff) << 24
      pos += 4; v
    }
    def fixed64(): Long = {
      require(pos + 8 <= end, "onnx: truncated fixed64")
      var v = 0L; var i = 7
      while (i >= 0) { v = (v << 8) | (buf(pos + i) & 0xffL); i -= 1 }
      pos += 8; v
    }
    /** (fieldNo, wireType) */
    def tag(): (Int, Int) = {
      val t = varint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }
    def lenDelim(): Reader = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, "onnx: truncated length-delimited")
      val r = new Reader(buf, pos, pos + n); pos += n; r
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => fixed64()
      case 2 => lenDelim()
      case 5 => fixed32()
      case w => throw new IllegalArgumentException(s"onnx: wire type $w unsupported")
    }
    def str(): String = {
      val r = lenDelim()
      new String(buf, r.pos, r.end - r.pos, "UTF-8")
    }
  }

  // ---- ONNX message shapes (field numbers per onnx.proto) -----------

  private final case class Tensor(name: String, dims: Seq[Long], values: Array[Double])
  private final case class Node(op: String, inputs: Seq[String],
      outputs: Seq[String], attrI: Map[String, Long], attrF: Map[String, Float])

  private def parseTensor(r: Reader): Tensor = {
    var name = ""; val dims = Seq.newBuilder[Long]; var dataType = 0L
    val floats = Array.newBuilder[Double]
    var raw: Array[Byte] = null
    while (r.hasMore) r.tag() match {
      case (1, 0) => dims += r.varint()
      case (1, 2) => val p = r.lenDelim(); while (p.hasMore) dims += p.varint()
      case (2, 0) => dataType = r.varint()
      case (4, 5) => floats += java.lang.Float.intBitsToFloat(r.fixed32()).toDouble
      case (4, 2) => // packed float_data
        val p = r.lenDelim()
        while (p.hasMore) floats += java.lang.Float.intBitsToFloat(p.fixed32()).toDouble
      case (10, 1) => floats += java.lang.Double.longBitsToDouble(r.fixed64())
      case (10, 2) => // packed double_data
        val p = r.lenDelim()
        while (p.hasMore) floats += java.lang.Double.longBitsToDouble(p.fixed64())
      case (8, 2) => name = r.str()
      case (9, 2) => val p = r.lenDelim()
        raw = java.util.Arrays.copyOfRange(p.buf, p.pos, p.end)
      case (_, w) => r.skip(w)
    }
    val fromFields = floats.result()
    val values =
      if (fromFields.nonEmpty) fromFields
      else if (raw != null) {
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        dataType match {
          case 1 => // FLOAT
            Array.fill(raw.length / 4)(bb.getFloat.toDouble)
          case 11 => // DOUBLE
            Array.fill(raw.length / 8)(bb.getDouble)
          case t => throw new IllegalArgumentException(
            s"onnx: tensor '$name' raw_data type $t unsupported (FLOAT=1/DOUBLE=11)")
        }
      } else Array.empty[Double]
    Tensor(name, dims.result(), values)
  }

  private def parseNode(r: Reader): Node = {
    var op = ""; val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]
    var aI = Map.empty[String, Long]; var aF = Map.empty[String, Float]
    while (r.hasMore) r.tag() match {
      case (1, 2) => ins += r.str()
      case (2, 2) => outs += r.str()
      case (4, 2) => op = r.str()
      case (5, 2) =>
        val a = r.lenDelim()
        var an = ""; var ai: Option[Long] = None; var af: Option[Float] = None
        while (a.hasMore) a.tag() match {
          case (1, 2) => an = a.str()
          case (2, 5) => af = Some(java.lang.Float.intBitsToFloat(a.fixed32()))
          case (3, 0) => ai = Some(a.varint())
          case (_, w) => a.skip(w)
        }
        ai.foreach(v => aI += an -> v)
        af.foreach(v => aF += an -> v)
      case (_, w) => r.skip(w)
    }
    Node(op, ins.result(), outs.result(), aI, aF)
  }

  // ---- semantic assembly --------------------------------------------

  /** Parse `bytes` (an ONNX ModelProto) into an [[MlpModel]] scoring
    * `inputCols` (which must match the graph input's width).
    */
  def fromBytes(bytes: Array[Byte], name: String, inputCols: Seq[String],
      outputCol: String = "score"): MlpModel = {
    val root = new Reader(bytes, 0, bytes.length)
    var graph: Reader = null
    while (root.hasMore) root.tag() match {
      case (7, 2) => graph = root.lenDelim()
      case (_, w) => root.skip(w)
    }
    require(graph != null, "onnx: no graph in ModelProto")
    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    val graphInputs = Seq.newBuilder[String]
    val graphOutputs = Seq.newBuilder[String]
    while (graph.hasMore) graph.tag() match {
      case (1, 2)  => nodes += parseNode(graph.lenDelim())
      case (5, 2)  => val t = parseTensor(graph.lenDelim()); inits += t.name -> t
      case (11, 2) =>
        val vi = graph.lenDelim()
        while (vi.hasMore) vi.tag() match {
          case (1, 2) => graphInputs += vi.str()
          case (_, w) => vi.skip(w)
        }
      case (12, 2) =>
        val vo = graph.lenDelim()
        while (vo.hasMore) vo.tag() match {
          case (1, 2) => graphOutputs += vo.str()
          case (_, w) => vo.skip(w)
        }
      case (_, w) => graph.skip(w)
    }
    val ns = nodes.result(); val ws = inits.result()
    val dataInputs = graphInputs.result().filterNot(ws.contains)
    require(dataInputs.size == 1,
      s"onnx: expected exactly one data input, got $dataInputs")

    // Walk the single chain from the data input. Nodes key by their
    // DATAFLOW input (the first input that is not an initializer —
    // Add(bias, x) puts the constant first); a tensor consumed by two
    // nodes means the graph branches, which the single-chain contract
    // rejects rather than silently importing one arbitrary path.
    val byInput: Map[String, Node] = {
      val pairs = ns.flatMap { n =>
        val flow = n.inputs.filterNot(ws.contains)
        (if (flow.nonEmpty) flow.take(1) else n.inputs.take(1)).map(_ -> n)
      }
      val dup = pairs.groupBy(_._1).collect { case (k, vs) if vs.sizeIs > 1 => k }
      require(dup.isEmpty, s"onnx: tensor(s) ${dup.mkString(", ")} consumed " +
        "by multiple nodes — not a single chain")
      pairs.toMap
    }
    var cur = dataInputs.head
    val layers = Seq.newBuilder[MlpLayer]
    var lastGemm: MlpLayer = null
    // true while an immediately preceding MatMul may still fold an Add
    // into its (currently zero) bias
    var matmulBiasOpen = false
    var n = 0
    while (byInput.contains(cur)) {
      val node = byInput(cur)
      node.op match {
        case "Gemm" =>
          require(node.attrF.getOrElse("alpha", 1.0f) == 1.0f &&
            node.attrF.getOrElse("beta", 1.0f) == 1.0f &&
            node.attrI.getOrElse("transA", 0L) == 0L,
            "onnx: Gemm with alpha/beta != 1 or transA=1 unsupported")
          val transB = node.attrI.getOrElse("transB", 0L) == 1L
          require(node.inputs.length >= 2,
            "onnx: Gemm needs at least (X, W) inputs")
          val w = ws.getOrElse(node.inputs(1), sys.error(
            s"onnx: Gemm weight '${node.inputs(1)}' not an initializer"))
          require(w.dims.length == 2, s"onnx: weight '${w.name}' must be 2-D")
          val (nOut, nIn) =
            if (transB) (w.dims(0).toInt, w.dims(1).toInt)
            else (w.dims(1).toInt, w.dims(0).toInt)
          require(w.values.length == nOut * nIn,
            s"onnx: weight '${w.name}' carries ${w.values.length} values " +
              s"for dims [${w.dims.mkString(",")}] — truncated tensor?")
          // the C (bias) input is OPTIONAL in the ONNX Gemm spec
          // (nn.Linear(bias=False) exports without it) — absent means
          // a zero bias, not a malformed file
          val b: Array[Double] = node.inputs.lift(2) match {
            case Some(bn) =>
              val t = ws.getOrElse(bn,
                sys.error(s"onnx: Gemm bias '$bn' not an initializer"))
              require(t.values.length == nOut,
                s"onnx: bias '${t.name}' length ${t.values.length} != $nOut outputs")
              t.values
            case None => new Array[Double](nOut)
          }
          val rows = Array.tabulate(nOut, nIn) { (o, i) =>
            if (transB) w.values(o * nIn + i) else w.values(i * nOut + o)
          }
          if (lastGemm != null) layers += lastGemm
          lastGemm = MlpLayer(rows, b, relu = false)
          matmulBiasOpen = false
        case "MatMul" =>
          // the skl2onnx/tf2onnx spelling: X·W with W an initializer
          // of dims [nIn, nOut] (no transpose in the MatMul op); an
          // immediately following Add supplies the bias
          require(node.inputs.length == 2, "onnx: MatMul needs (X, W)")
          val w = ws.getOrElse(node.inputs(1), sys.error(
            s"onnx: MatMul weight '${node.inputs(1)}' not an initializer"))
          require(w.dims.length == 2, s"onnx: weight '${w.name}' must be 2-D")
          val (nIn, nOut) = (w.dims(0).toInt, w.dims(1).toInt)
          require(w.values.length == nOut * nIn,
            s"onnx: weight '${w.name}' carries ${w.values.length} values " +
              s"for dims [${w.dims.mkString(",")}] — truncated tensor?")
          val rows = Array.tabulate(nOut, nIn)((o, i) => w.values(i * nOut + o))
          if (lastGemm != null) layers += lastGemm
          lastGemm = MlpLayer(rows, new Array[Double](nOut), relu = false)
          matmulBiasOpen = true
        case "Add" =>
          require(matmulBiasOpen,
            "onnx: Add is supported only as the bias of an immediately " +
              "preceding MatMul (the MatMul+Add spelling of Gemm)")
          val biasNames = node.inputs.filter(_ != cur)
          require(biasNames.length == 1,
            s"onnx: Add expects (MatMul output, bias), got ${node.inputs}")
          val t = ws.getOrElse(biasNames.head, sys.error(
            s"onnx: Add bias '${biasNames.head}' not an initializer"))
          require(t.values.length == lastGemm.b.length,
            s"onnx: bias '${t.name}' length ${t.values.length} != " +
              s"${lastGemm.b.length} outputs")
          lastGemm = lastGemm.copy(b = t.values)
          matmulBiasOpen = false
        case act @ ("Relu" | "Sigmoid" | "Tanh") =>
          require(lastGemm != null, s"onnx: $act before any Gemm/MatMul")
          require(lastGemm.act == "linear",
            s"onnx: $act follows a layer already activated with " +
              s"'${lastGemm.act}' — stacked activations are not a " +
              "plain MLP chain")
          lastGemm = lastGemm.copy(act = act.toLowerCase)
          matmulBiasOpen = false
        case "Softmax" =>
          // the other common skl2onnx classifier ending: multi-class
          // probabilities. Importable only as the TERMINAL node (the
          // MlpModel constructor enforces final-layer-only); axis must
          // name the class axis of a [batch, classes] input
          require(lastGemm != null, "onnx: Softmax before any Gemm/MatMul")
          require(lastGemm.act == "linear",
            s"onnx: Softmax follows a layer already activated with " +
              s"'${lastGemm.act}' — stacked activations are not a " +
              "plain MLP chain")
          val axis = node.attrI.getOrElse("axis", -1L)
          require(axis == -1L || axis == 1L,
            s"onnx: Softmax axis $axis unsupported (expected the class " +
              "axis of a [batch, classes] tensor: -1 or 1)")
          lastGemm = lastGemm.copy(act = "softmax")
          matmulBiasOpen = false
        case other => throw new IllegalArgumentException(
          s"onnx: op '$other' unsupported — graft imports plain " +
            "Gemm / MatMul[->Add] chains with Relu/Sigmoid/Tanh " +
            "activations plus a terminal Softmax; a linear/relu-ended " +
            "chain squashes through graft's deterministic rational " +
            "sigmoid, a Sigmoid/Tanh/Softmax ending keeps its own " +
            "calibration (JVM scoring path)")
      }
      cur = node.outputs.head
      n += 1
      require(n <= 1024, "onnx: graph chain too long or cyclic")
    }
    // when the graph declares outputs, the walked chain must END at
    // the (single) declared output — a walk that stops early means
    // part of the graph was not imported
    val outs = graphOutputs.result()
    if (outs.nonEmpty) {
      require(outs.size == 1, s"onnx: expected one graph output, got $outs")
      require(cur == outs.head,
        s"onnx: chain walk ended at '$cur' but the graph's declared " +
          s"output is '${outs.head}' — graph not a single imported chain")
    }
    require(lastGemm != null, "onnx: no Gemm layer found")
    layers += lastGemm
    val model = MlpModel(name, inputCols, layers.result(), outputCol)
    require(model.layers.head.w.headOption.forall(_.length == inputCols.length),
      s"onnx: first layer expects ${model.layers.head.w.head.length} " +
        s"inputs, got ${inputCols.length} input columns")
    model
  }

  def fromFile(path: String, name: String, inputCols: Seq[String],
      outputCol: String = "score"): MlpModel =
    fromBytes(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      name, inputCols, outputCol)
}
