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
  def dotF(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = Math.min(a.numElements(), b.numElements())
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotD(a: ArrayData, b: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = Math.min(a.numElements(), b.numElements())
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def fn: String = if (isFloat) "dotF" else "dotD"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (isFloat) VecUtil.dotF(a, b) else VecUtil.dotD(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecUtil.$fn($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
