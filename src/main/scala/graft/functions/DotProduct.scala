package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** In-order double-precision dot product over two numeric arrays.
  *
  * Native Catalyst expression with codegen: one tight loop per pair
  * instead of zip_with + aggregate HOFs (which interpret a lambda per
  * element — the profile showed them dominating every cosine-heavy
  * operator). Accumulation is strictly left-to-right starting from
  * 0.0, bit-identical to the SQL-oracle formulation
  * `list_reduce(list_prepend(0.0, [a[i]*b[i] ...]), +)`.
  */
object VecUtil {
  /** aF/bF flag float32 element storage per side (mixed-type pairs
    * appear in IVF, where float corpus vectors meet double centroids)
    */
  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    var s = 0.0
    var i = 0
    val n = Math.min(a.numElements(), b.numElements())
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecUtil.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecUtil.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
