package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native IVF/PQ building blocks (reference: varpulis ANN surface;
  * Jégou et al., PQ for nearest neighbor search).
  *
  * The previous pure-`Column` formulation built the quantizers as
  * literal expression forests — per corpus row, nlist `vec_dot`s for
  * the coarse cell plus m×ksub `slice`+`vec_dot` structs for the PQ
  * codes (128 subtree copies at the default m=4, ksub=32). The data
  * work is tiny; the cost was FIXED plan overhead — analysis,
  * optimization and Janino compilation of a multi-hundred-KB
  * generated function — measured at ~4 s per run regardless of
  * corpus size (sf0.001 ≈ sf0.1). These expressions collapse each
  * stage to ONE codegen'd call with the trained
  * centroids/codebooks attached as reference objects, so the plan is
  * a few nodes and the per-row loops are tight primitive code.
  *
  * Score parity with the literal formulation (bit-identical):
  *  - coarse: s(cell) = dot(v, c_cell)/|c_cell|, in-order
  *    double-precision accumulation (VecUtil.dot's contract), best
  *    score wins, ties to the LOWER cell id;
  *  - PQ code mi: argmax_j dot(v_sub, c_j)/|v| − |c_j|²/2 (the
  *    L2-nearest centroid of the normalized subvector without
  *    materializing it), first max wins = lower j on ties;
  *  - ADC tables: t[mi][j] = dot(v_sub, c_j)/|v|.
  */
object PqOpsUtil {

  private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)

  /** dot(v[off..off+len), c[0..len)) with in-order accumulation */
  private def subDot(v: ArrayData, off: Int, c: Array[Double],
      isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = Math.min(c.length, v.numElements() - off)
    while (i < n) { s += elem(v, off + i, isFloat) * c(i); i += 1 }
    s
  }

  private def fullNorm(v: ArrayData, isFloat: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) { val x = elem(v, i, isFloat); s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** The nProbe best coarse cells, ordered score-desc with ties to
    * the lower cell id — exactly `reverse(array_sort(struct(s,
    * −cell)))` over the literal struct array.
    */
  def cellProbes(v: ArrayData, isFloat: Boolean, cents: Array[Array[Double]],
      centNorms: Array[Double], nProbe: Int): ArrayData = {
    val nlist = cents.length
    val scores = new Array[Double](nlist)
    var cell = 0
    while (cell < nlist) {
      scores(cell) = subDot(v, 0, cents(cell), isFloat) / centNorms(cell)
      cell += 1
    }
    val order = Array.range(0, nlist)
    // nlist is small (16-ish): insertion sort by (score desc, cell asc)
    var i = 1
    while (i < nlist) {
      val o = order(i)
      val s = scores(o)
      var j = i - 1
      while (j >= 0 && scores(order(j)) < s) { order(j + 1) = order(j); j -= 1 }
      order(j + 1) = o
      i += 1
    }
    val n = Math.min(nProbe, nlist)
    val out = new Array[Int](n)
    System.arraycopy(order, 0, out, 0, n)
    new GenericArrayData(out)
  }

  /** Per-subspace PQ codes in one pass (m codes, 0-based). */
  def pqCodes(v: ArrayData, isFloat: Boolean,
      codebooks: Array[Array[Array[Double]]],
      halfSq: Array[Array[Double]]): ArrayData = {
    val m = codebooks.length
    val nn = fullNorm(v, isFloat)
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      val halves = halfSq(mi)
      val sub = book(0).length
      var best = Double.NegativeInfinity
      var bestJ = 0
      var j = 0
      while (j < book.length) {
        val s = subDot(v, mi * sub, book(j), isFloat) / nn - halves(j)
        if (s > best) { best = s; bestJ = j }
        j += 1
      }
      out(mi) = bestJ
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** ADC lookup tables t[mi][j] = dot(v_sub, c_j)/|v|. */
  def adcTables(v: ArrayData, isFloat: Boolean,
      codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val nn = fullNorm(v, isFloat)
    val rows = new Array[ArrayData](m)
    var mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      val sub = book(0).length
      val t = new Array[Double](book.length)
      var j = 0
      while (j < book.length) {
        t(j) = subDot(v, mi * sub, book(j), isFloat) / nn
        j += 1
      }
      rows(mi) = new GenericArrayData(t)
      mi += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  /** ADC score = Σ_mi tables[mi][codes[mi]]. */
  def adcScore(tables: ArrayData, codes: ArrayData): Double = {
    var s = 0.0
    var mi = 0
    val m = codes.numElements()
    while (mi < m) {
      s += tables.getArray(mi).getDouble(codes.getInt(mi))
      mi += 1
    }
    s
  }
}

private[functions] trait VecFloatCheck { self: UnaryExpression =>
  protected lazy val childIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/** nProbe best coarse cells of a vector (see [[PqOpsUtil.cellProbes]]). */
case class CellProbes(child: Expression, cents: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression with VecFloatCheck {
  @transient private lazy val centNorms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum) max 1e-300)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cell_probes"

  override protected def nullSafeEval(input: Any): Any =
    PqOpsUtil.cellProbes(input.asInstanceOf[ArrayData], childIsFloat,
      cents, centNorms, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOpsUtil.cellProbes($c, $childIsFloat, $centsRef, $normsRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): CellProbes =
    copy(child = newChild)
}

/** Per-subspace PQ codes of a vector (see [[PqOpsUtil.pqCodes]]). */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VecFloatCheck {
  // |c_j|²/2 per (subspace, centroid) — in-order sum like the literal
  // `cv.foreach(x => s += x*x); s/2` it replaces
  @transient private lazy val halfSq: Array[Array[Double]] =
    codebooks.map(_.map { cv =>
      var s = 0.0; cv.foreach(x => s += x * x); s / 2.0
    })
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any =
    PqOpsUtil.pqCodes(input.asInstanceOf[ArrayData], childIsFloat,
      codebooks, halfSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val halfRef = ctx.addReferenceObj("halfSq", halfSq, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOpsUtil.pqCodes($c, $childIsFloat, $booksRef, $halfRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** ADC lookup tables of a query vector (see [[PqOpsUtil.adcTables]]). */
case class AdcTables(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with VecFloatCheck {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "adc_tables"

  override protected def nullSafeEval(input: Any): Any =
    PqOpsUtil.adcTables(input.asInstanceOf[ArrayData], childIsFloat, codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOpsUtil.adcTables($c, $childIsFloat, $booksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTables =
    copy(child = newChild)
}

/** ADC score of a coded corpus row against a query's tables. */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(t: Any, c: Any): Any =
    PqOpsUtil.adcScore(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, c) => s"graft.functions.PqOpsUtil.adcScore($t, $c)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}
