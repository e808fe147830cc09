package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Predicate-constrained GRETA trend DP (greta.rs:20-29 adjacency;
  * Poppe et al., VLDB'17) as ONE native pass over the window group's
  * event array, replacing the previous interpreted `aggregate(...)`
  * higher-order-function fold:
  *
  *   count(e) = 1 + Σ count(e')   over earlier e' with v(e') < v(e)
  *   sum(e)   = v(e)·count(e) + Σ sum(e')   (same predecessor set)
  *
  * The HOF formulation re-filtered the whole accumulated array per
  * element — O(n²) per group through Catalyst's interpreted lambda
  * path (50µs+/element, the SURVEY §8 sharp edge). Here the
  * strictly-less predecessor prefix is a Fenwick tree over
  * coordinate-compressed value ranks: O(n log n) on primitive arrays,
  * emitted through codegen via a static helper, so a dense key×window
  * group stops being the straggler task at scale.
  *
  * Arithmetic contract (bit-compatible with the recursive-CTE oracle
  * and the previous fold): pair comparisons are on the RAW double
  * values; sums are in exact decimal cents — each value rounded
  * HALF_UP to 2 places (Spark's double→decimal(18,2) cast), products
  * and sums accumulated in integer cents (exact while the running
  * total fits a long, i.e. decimal(20,2) — wider than any group the
  * 2^n trend blow-up leaves materializable), and the final total
  * converted cents→double by correctly-rounded BigDecimal division,
  * matching decimal(28,2)→double. Event values must be non-null
  * (callers filter; a null would have poisoned the fold path too).
  *
  * Input: array<struct<o, v: double>> already sorted by the order
  * field; output struct<c: bigint, s: double> = (count_trends,
  * sum_trends) totals for the group.
  */
object GretaDpUtil {

  def dp(evs: ArrayData): InternalRow = {
    val n = evs.numElements()
    val vals = new Array[Double](n)
    val cents = new Array[Long](n)
    var i = 0
    while (i < n) {
      val st = evs.getStruct(i, 2)
      val v = st.getDouble(1)
      vals(i) = v
      cents(i) = JBigDecimal.valueOf(v)
        .setScale(2, RoundingMode.HALF_UP).unscaledValue().longValue()
      i += 1
    }
    // coordinate-compress the values: Fenwick ranks 1..m
    val sorted = vals.clone()
    java.util.Arrays.sort(sorted)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || sorted(i) != sorted(m - 1)) { sorted(m) = sorted(i); m += 1 }
      i += 1
    }
    val fenC = new Array[Long](m + 1)
    val fenS = new Array[Long](m + 1)
    var totC = 0L
    var totS = 0L
    i = 0
    while (i < n) {
      // # distinct values strictly below vals(i) == its 0-based rank
      var lo = 0
      var hi = m
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) < vals(i)) lo = mid + 1 else hi = mid
      }
      // prefix query over ranks 1..lo: earlier events with smaller v
      var pc = 0L
      var ps = 0L
      var r = lo
      while (r > 0) { pc += fenC(r); ps += fenS(r); r -= r & (-r) }
      val c = 1L + pc
      val s = cents(i) * c + ps
      totC += c
      totS += s
      r = lo + 1
      while (r <= m) { fenC(r) += c; fenS(r) += s; r += r & (-r) }
      i += 1
    }
    val sDouble = new JBigDecimal(totS).movePointLeft(2).doubleValue()
    new GenericInternalRow(Array[Any](totC, sDouble))
  }
}

case class GretaDp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("c", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false)))
  override def prettyName: String = "greta_dp"

  override protected def nullSafeEval(input: Any): Any =
    GretaDpUtil.dp(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GretaDpUtil.dp($c)")

  override protected def withNewChildInternal(newChild: Expression): GretaDp =
    copy(child = newChild)
}
