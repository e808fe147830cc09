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

  /** A REAL multi-layer perceptron executed in the JVM — the closest
    * this zero-egress environment can get to the reference's ONNX
    * scoring (scoring.rs): users export trained weights to the
    * documented JSON format below and run genuine NN inference as a
    * narrow per-row map, no external runtime required.
    *
    * Format (`fromJson`): `{"name":"m","inputs":["a","b"],
    * "layers":[{"w":[[...row-major out×in...]],"b":[...],
    * "act":"relu"|"linear"}]}` — i.e. each layer y = act(W·x + b).
    * The final layer's single output squashes through the same
    * rational sigmoid 0.5 + 0.5·z/(1+|z|) as [[LinearModel]].
    *
    * Determinism contract: accumulation is in index order
    * (((w0·x0 + w1·x1) + …) + b), ReLU is max(x, 0), and the squash
    * avoids exp() — every operation is an IEEE double primitive with
    * one correctly-rounded result, so the JVM loop below reproduces
    * BIT-identically the SQL arithmetic emitted by [[MlpModel
    * .toOracleSql]], and MLP scoring is hash-oracle-checkable
    * (m3_mlp_score) — real NN inference under the same gate as every
    * relational operator.
    *
    * Scale shape: mapPartitions (the per-partition init is where an
    * ONNX session would load); weights ride in the closure —
    * model-as-literal, like the DSIR/BM25 ingest twins.
    */
  /** One dense layer y = act(W·x + b). Activations: `linear`, `relu`
    * (both hash-oracle-able — pure IEEE primitives), `sigmoid` /
    * `tanh` (the skl2onnx MLPClassifier defaults) computed via
    * StrictMath — fdlibm, bit-identical on every JVM, so the
    * determinism contract holds JVM-to-JVM — and `softmax` (FINAL
    * layer only, multi-class): p_i = exp(z_i − max z)/Σ exp(z_j −
    * max z), max-subtracted for overflow stability, StrictMath.exp,
    * index-order denominator sum. sigmoid/tanh/softmax are NOT
    * SQL-oracle-able (libm exp() rounds differently engine-to-
    * engine), so [[MlpModel.toOracleSql]] rejects them and the
    * oracled queries (m4/m5/s33) stay on linear/relu chains.
    */
  final case class MlpLayer(w: Array[Array[Double]], b: Array[Double],
      act: String) {
    require(MlpLayer.activations(act),
      s"unsupported activation '$act' (${MlpLayer.activations.mkString("|")})")
    def relu: Boolean = act == "relu"
  }

  object MlpLayer {
    val activations: Set[String] =
      Set("linear", "relu", "sigmoid", "tanh", "softmax")
    /** boolean-era constructor kept for the linear/relu call sites */
    def apply(w: Array[Array[Double]], b: Array[Double],
        relu: Boolean): MlpLayer =
      MlpLayer(w, b, if (relu) "relu" else "linear")
  }

  final case class MlpModel(
      name: String,
      inputCols: Seq[String],
      layers: Seq[MlpLayer],
      outputCol: String = "score") extends Model {
    require(layers.nonEmpty &&
      (layers.last.b.length == 1 || layers.last.act == "softmax"),
      "final layer must have exactly one output (or be softmax multi-class)")
    require(layers.init.forall(_.act != "softmax"),
      "softmax is a final-layer activation only")

    /** Softmax-terminated multi-class classifier? Scoring then emits
      * the top class's probability to `outputCol` and its index to
      * `outputCol_class`.
      */
    def multiClass: Boolean = layers.last.act == "softmax"

    /** One forward pass; index-order accumulation (see contract).
      * The rational output squash applies only to a linear/relu last
      * layer (the logit contract); a sigmoid/tanh last layer IS the
      * network's own calibration and passes through untouched.
      */
    /** Raw network output: every layer applied, including a final
      * softmax (max-subtracted StrictMath.exp, index-order
      * denominator) — the vector the per-class contracts read.
      */
    def forwardRaw(x0: Array[Double]): Array[Double] = {
      var x = x0
      var li = 0
      while (li < layers.length) {
        val l = layers(li)
        // activation resolved once per layer, outside the hot loop
        val code = l.act match {
          case "relu" => 1; case "sigmoid" => 2; case "tanh" => 3
          case "softmax" => 4; case _ => 0
        }
        val y = new Array[Double](l.b.length)
        var o = 0
        while (o < l.b.length) {
          var s = 0.0
          val row = l.w(o)
          var i = 0
          while (i < row.length) { s += row(i) * x(i); i += 1 }
          s += l.b(o)
          y(o) = code match {
            case 1 => if (s < 0.0) 0.0 else s
            case 2 => 1.0 / (1.0 + StrictMath.exp(-s)) // fdlibm: JVM-stable
            case 3 => StrictMath.tanh(s)
            case _ => s // softmax applies vector-wise below
          }
          o += 1
        }
        if (code == 4) {
          var m = y(0); var j = 1
          while (j < y.length) { if (y(j) > m) m = y(j); j += 1 }
          var denom = 0.0; j = 0
          while (j < y.length) {
            y(j) = StrictMath.exp(y(j) - m); denom += y(j); j += 1
          }
          j = 0
          while (j < y.length) { y(j) /= denom; j += 1 }
        }
        x = y
        li += 1
      }
      x
    }

    /** Index of the most probable class (first wins on ties). */
    def argmax(probs: Array[Double]): Int = {
      var best = 0; var i = 1
      while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
      best
    }

    def forward(x0: Array[Double]): Double = {
      val out = forwardRaw(x0)
      if (multiClass) out(argmax(out)) // top class's probability
      else {
        val z = out(0)
        if (layers.last.act == "sigmoid" || layers.last.act == "tanh") z
        else 0.5 + 0.5 * z / (1.0 + math.abs(z))
      }
    }

    override def score(df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val cols = inputCols
      val self = this
      val mc = multiClass
      val extra = org.apache.spark.sql.types.StructField(outputCol,
        org.apache.spark.sql.types.DoubleType, nullable = true) +:
        (if (mc) Seq(org.apache.spark.sql.types.StructField(
          s"${outputCol}_class", org.apache.spark.sql.types.LongType,
          nullable = true))
         else Nil)
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields ++ extra)
      val enc = org.apache.spark.sql.Encoders.row(schema)
      df.mapPartitions { it =>
        // per-partition init point (a native runtime would load here)
        it.map { row =>
          val x = new Array[Double](cols.length)
          var i = 0
          var anyNull = false
          while (i < cols.length) {
            row.getAs[Any](cols(i)) match {
              case d: Double => x(i) = d
              case f: Float => x(i) = f.toDouble
              case l: Long => x(i) = l.toDouble
              case n: Int => x(i) = n.toDouble
              // null (or non-numeric) inputs propagate to a null
              // score — the same semantics as the model's generated
              // SQL arithmetic, keeping the determinism contract
              case _ => anyNull = true
            }
            i += 1
          }
          val appended: Seq[Any] =
            if (anyNull) if (mc) Seq(null, null) else Seq(null)
            else if (mc) {
              val probs = self.forwardRaw(x)
              val k = self.argmax(probs)
              Seq(java.lang.Double.valueOf(probs(k)),
                java.lang.Long.valueOf(k.toLong))
            } else Seq(java.lang.Double.valueOf(self.forward(x)))
          org.apache.spark.sql.Row.fromSeq(row.toSeq ++ appended)
        }
      }(enc)
    }

    /** The exact SQL arithmetic of [[forward]] over the given input
      * expressions — same literals, same association order — for the
      * DuckDB oracle (and for running the model as pure column
      * arithmetic on any SQL engine).
      */
    def toOracleSql(inputs: Seq[String]): String = {
      def lit(d: Double): String = {
        // repr that round-trips the exact double in both engines
        val s = d.toString
        (if (s.contains('.') || s.contains('e') || s.contains('E')) s
         else s + ".0") + "::DOUBLE"
      }
      require(layers.forall(l => l.act == "linear" || l.act == "relu"),
        "sigmoid/tanh/softmax layers are not SQL-oracle-able (libm " +
          "exp() is not bit-reproducible across engines); score them " +
          "through the JVM path")
      var exprs: Seq[String] = inputs
      for (l <- layers) {
        exprs = l.w.zip(l.b).map { case (row, bb) =>
          val sum = row.zip(exprs)
            .map { case (w, e) => s"${lit(w)} * ($e)" }
            .mkString(" + ")
          val z = s"$sum + ${lit(bb)}"
          // CASE, not greatest(): SQL greatest() IGNORES null args
          // (greatest(NULL, 0.0) = 0.0 in both DuckDB and Spark),
          // which would break the shared null semantics — the JVM
          // scorer returns null for any null input, and this CASE
          // propagates the NULL the same way
          if (l.relu) s"(CASE WHEN ($z) < 0.0::DOUBLE THEN 0.0::DOUBLE ELSE ($z) END)"
          else s"($z)"
        }.toSeq
      }
      val z = exprs.head
      s"0.5::DOUBLE + 0.5::DOUBLE * ($z) / (1.0::DOUBLE + abs($z))"
    }
  }

  object MlpModel {
    /** Load from the documented JSON weight format (see [[MlpModel]]).
      * Uses the Jackson shipped with Spark — no extra dependency.
      */
    def fromJson(json: String): MlpModel = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = m.readTree(json)
      import scala.jdk.CollectionConverters._
      val name = root.get("name").asText()
      val inputs = root.get("inputs").elements().asScala.map(_.asText()).toSeq
      val layers = root.get("layers").elements().asScala.map { ln =>
        val w = ln.get("w").elements().asScala.map(r =>
          r.elements().asScala.map(_.asDouble()).toArray).toArray
        val b = ln.get("b").elements().asScala.map(_.asDouble()).toArray
        val act = Option(ln.get("act")).map(_.asText()).getOrElse("linear")
        MlpLayer(w, b, act) // validates against MlpLayer.activations
      }.toSeq
      MlpModel(name, inputs, layers)
    }
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
