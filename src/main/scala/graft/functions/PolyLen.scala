package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's polymorphic `len()` builtin
  * (docs/language/builtins.md): character count of a string, element
  * count of a list/map, byte count of a binary — one function, typed
  * at analysis. Spark splits this across `length` (string/binary)
  * and `size` (array/map); the VPL front-end needs the unified form.
  */
case class PolyLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType | _: MapType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len() expects string/binary/array/map, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType   => input.asInstanceOf[UTF8String].numChars()
    case BinaryType   => input.asInstanceOf[Array[Byte]].length
    case _: ArrayType => input.asInstanceOf[ArrayData].numElements()
    case _: MapType   => input.asInstanceOf[MapData].numElements()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType   => defineCodeGen(ctx, ev, c => s"($c).numChars()")
      case BinaryType   => defineCodeGen(ctx, ev, c => s"($c).length")
      case _            => defineCodeGen(ctx, ev, c => s"($c).numElements()")
    }

  override protected def withNewChildInternal(newChild: Expression): PolyLen =
    copy(child = newChild)
}
