package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native O(n) Hawkes-intensity folds (reference:
  * crates/varpulis-runtime/src/pst/hawkes.rs) — the codegen'd
  * replacements for the interpreted `aggregate(...)` HOF lambdas the
  * first formulation used. The HOF form had two scale problems: the
  * per-element lambda runs interpreted (~50µs/element, SURVEY §8),
  * and its `array_append` accumulator copies the array every element,
  * making the fold quadratic in per-key history. These expressions
  * run one tight JVM loop per key with a preallocated output array.
  *
  * Arithmetic is kept TEXTUALLY parallel to the recursive-CTE DuckDB
  * oracles (same operation order; `Math.exp` is what Catalyst's
  * `exp` calls, and both engines round to 6 places to absorb libm
  * last-ulp variance), so f4/f6 stay hash-green.
  *
  * Memory bound: the per-key `sort_array(collect_list(...))` feeding
  * these folds holds ONE KEY's full history in a single row — fine
  * for bounded keys (users/devices), a deliberate non-starter for a
  * 100 TB single-key timeline. The recursion itself is O(1)-per-event
  * state (li, lt [, EMA moments]); the streaming twin
  * (StreamingQueries.streamHawkes) carries exactly that state per key
  * via flatMapGroupsWithState and is the path for unbounded
  * histories.
  */
object HawkesFoldUtil {

  /** One step of the fixed-parameter recursion, hawkes.rs:7-9 —
    * the single source of truth shared by the batch fold below and
    * the streaming twin (StreamingQueries.streamHawkes), so the two
    * paths cannot diverge. `lt < 0` marks a key's first event
    * (timestamps here are unix micros of modern data, always ≥ 0).
    */
  def step(li: Double, lt: Long, t: Long, mu: Double, alpha: Double,
      beta: Double): Double =
    if (lt < 0) mu + alpha
    else mu + (li - mu + alpha) * Math.exp(-beta * (t - lt) / 1e6)

  /** Fixed-parameter recursion over one key's sorted event array.
    * Input: array<struct<o:long, t_us:long>> sorted by o.
    * Output: array<struct<o:long, i:double>>.
    */
  def fold(evs: ArrayData, mu: Double, alpha: Double, beta: Double): ArrayData = {
    val n = evs.numElements()
    val out = new Array[Any](n)
    var li = 0.0
    var lt = -1L
    var o2 = 0
    var i = 0
    while (i < n) {
      // null elements (possible via the registered SQL surface) are
      // skipped — they carry no event to fold
      val st = if (evs.isNullAt(i)) null else evs.getStruct(i, 2)
      if (st != null) {
        val o = st.getLong(0)
        val t = st.getLong(1)
        val inten = step(li, lt, t, mu, alpha, beta)
        li = inten
        lt = t
        out(o2) = new GenericInternalRow(Array[Any](o, inten))
        o2 += 1
      }
      i += 1
    }
    if (o2 == n) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOfRange(
      out.asInstanceOf[Array[AnyRef]], 0, o2).asInstanceOf[Array[Any]])
  }

  /** Adaptive recursion (hawkes.rs estimate_parameters): EMA moment
    * matching of mu/beta after MIN_EVENTS_FOR_ESTIMATION (10) events,
    * EMA_ALPHA = 0.05, alpha = mu/2, intensity floored at mu.
    * Input as [[fold]]; output array<struct<o:long, i:double, b:double>>
    * where b = clamp(intensity/mu, 1, 5) under the CURRENT mu.
    */
  def foldAdaptive(evs: ArrayData, mu0: Double, alpha0: Double,
      beta0: Double): ArrayData = {
    val nEl = evs.numElements()
    val out = new Array[Any](nEl)
    var li = 0.0
    var lt = -1L
    var ed = 0.0
    var ed2 = 0.0
    var n = 0L
    var mu = mu0
    var al = alpha0
    var be = beta0
    var o2 = 0
    var i = 0
    while (i < nEl) {
      val st = if (evs.isNullAt(i)) null else evs.getStruct(i, 2)
      if (st == null) { i += 1 } // skip null elements (SQL surface)
      else {
      val o = st.getLong(0)
      val t = st.getLong(1)
      if (n == 0L) {
        val inten = mu + al
        val b = Math.min(Math.max(inten / mu, 1.0), 5.0)
        out(o2) = new GenericInternalRow(Array[Any](o, inten, b))
        o2 += 1
        li = inten; lt = t; n = 1L
      } else {
        val dt = Math.max((t - lt).toDouble / 1e6, 0.0)
        val ed1 = if (n == 1L) dt else 0.05 * dt + 0.95 * ed
        val ed2n = if (n == 1L) dt * dt else 0.05 * dt * dt + 0.95 * ed2
        val iRaw = mu + (li - mu + al) * Math.exp(-be * dt)
        val est = (n + 1L) >= 10L
        val muN = if (est) Math.max(1.0 / ed1, 1e-15) else mu
        val varN = ed2n - ed1 * ed1
        val beN =
          if (est && varN > 0.0) Math.max(1.0 / Math.sqrt(varN), 1e-15) else be
        val alN = if (est) 0.5 * muN else al
        val iN = if (est) Math.max(iRaw, muN) else iRaw
        val b = Math.min(Math.max(iN / muN, 1.0), 5.0)
        out(o2) = new GenericInternalRow(Array[Any](o, iN, b))
        o2 += 1
        li = iN; lt = t; ed = ed1; ed2 = ed2n; n += 1L
        mu = muN; al = alN; be = beN
      }
      i += 1
      }
    }
    if (o2 == nEl) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOfRange(
      out.asInstanceOf[Array[AnyRef]], 0, o2).asInstanceOf[Array[Any]])
  }
}

/** Fixed-parameter Hawkes fold over one key's sorted event array. */
case class HawkesFold(child: Expression, mu: Double, alpha: Double,
    beta: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("o", LongType, nullable = false),
    StructField("i", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "hawkes_fold"

  override protected def nullSafeEval(evs: Any): Any =
    HawkesFoldUtil.fold(evs.asInstanceOf[ArrayData], mu, alpha, beta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hawkesFold", this, classOf[HawkesFold].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HawkesFoldUtil.fold($c, $self.mu(), $self.alpha(), $self.beta())")
  }

  override protected def withNewChildInternal(newChild: Expression): HawkesFold =
    copy(child = newChild)
}

/** Adaptive (EMA moment-matched) Hawkes fold; see [[HawkesFoldUtil]]. */
case class HawkesFoldAdaptive(child: Expression, mu0: Double, alpha0: Double,
    beta0: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("o", LongType, nullable = false),
    StructField("i", DoubleType, nullable = false),
    StructField("b", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "hawkes_fold_adaptive"

  override protected def nullSafeEval(evs: Any): Any =
    HawkesFoldUtil.foldAdaptive(evs.asInstanceOf[ArrayData], mu0, alpha0, beta0)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hawkesFoldA", this,
      classOf[HawkesFoldAdaptive].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HawkesFoldUtil.foldAdaptive($c, $self.mu0(), $self.alpha0(), $self.beta0())")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HawkesFoldAdaptive = copy(child = newChild)
}
