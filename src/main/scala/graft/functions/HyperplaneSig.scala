package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Random-hyperplane LSH signature over an embedding vector, as a
  * single-pass native expression (one tight loop over the vector
  * updating all nBits projections — versus the nBits separate
  * zip_with+aggregate HOF folds of a pure-`Column` formulation, which
  * interpret a lambda per element and are excluded from whole-stage
  * codegen).
  *
  * Bit i of the signature = sign of Σ_j v[j] · w(i, j), where the
  * hyperplane component w(i, j) = (splitmix64((i << 32) + j) %
  * 1,000,000) / 2,000,000 ∈ (−0.5, 0.5) — deterministic, stateless,
  * identical on every executor/run, and reproducible in the DuckDB
  * oracle with 128-bit modular arithmetic (the reason splitmix64
  * replaced the earlier seeded-xxhash64 family; any fixed
  * independent-ish family works for LSH).
  *
  * Projections accumulate strictly in dim order per bit, so the
  * oracle's in-order `list_reduce` fold is bit-identical.
  */
object HyperplaneUtil {
  private final val Golden = 0x9e3779b97f4a7c15L
  private final val M1 = 0xbf58476d1ce4e5b9L
  private final val M2 = 0x94d049bb133111ebL

  /** splitmix64((bit << 32) + dim) → pseudo-uniform in (−0.5, 0.5). */
  def component(bit: Int, dim: Int): Double = {
    var z = (bit.toLong << 32) + dim.toLong + Golden
    z = (z ^ (z >>> 30)) * M1
    z = (z ^ (z >>> 27)) * M2
    z = z ^ (z >>> 31)
    (z % 1000000L).toDouble / 2000000.0
  }

  def sig(vec: ArrayData, nBits: Int, isFloat: Boolean): Long = {
    val projs = new Array[Double](nBits)
    var j = 0
    val n = vec.numElements()
    while (j < n) {
      val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      var i = 0
      while (i < nBits) {
        projs(i) += x * component(i, j)
        i += 1
      }
      j += 1
    }
    var bucket = 0L
    var i = 0
    while (i < nBits) {
      if (projs(i) >= 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }
}

case class HyperplaneSig(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneUtil.sig(input.asInstanceOf[ArrayData], nBits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HyperplaneUtil.sig($c, $nBits, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
