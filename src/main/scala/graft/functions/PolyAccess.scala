package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Analysis-time-polymorphic container access for the VPL front-end:
  * the reference's `x[i]`, `x[a:b]` and `v in x` work on arrays,
  * string-keyed maps AND strings, dispatching on the runtime value
  * (engine/evaluator.rs Expr::Index / Expr::Slice / BinOp::In). A
  * Catalyst column knows its type at ANALYSIS time instead, so these
  * expressions dispatch once on `child.dataType` — same user-visible
  * semantics, no per-row tag checks.
  *
  * CodegenFallback by design: these serve the VPL expression surface
  * (per-event scalar work), not the dedup/ANN hot paths, and the
  * fallback keeps the polymorphic eval in one readable place. Indexing
  * follows the reference exactly: 0-based, negative = from the end,
  * out-of-range = null. Slices are Python-style clamped `[start, end)`
  * where a NEGATIVE start behaves as the reference's `as usize` cast
  * does (start past the end → empty result) and a negative end clamps
  * to len.
  */
object PolyAccess {
  private[functions] def intLike(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
}

case class PolyIndex(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import PolyAccess.intLike

  override def dataType: DataType = left.dataType match {
    case ArrayType(et, _)   => et
    case MapType(_, v, _)   => v
    case _                  => StringType
  }
  override def nullable: Boolean = true
  override def prettyName: String = "poly_index"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case _: ArrayType | StringType if intLike(right.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case MapType(StringType, _, _) if right.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"indexing expects array[int], map[string] or string[int], got ${other.sql}[${right.dataType.sql}]")
  }

  override protected def nullSafeEval(container: Any, index: Any): Any =
    left.dataType match {
      case ArrayType(et, _) =>
        val arr = container.asInstanceOf[ArrayData]
        val n = arr.numElements()
        var i = index match { case l: Long => l; case i: Int => i.toLong }
        if (i < 0) i += n
        if (i < 0 || i >= n || arr.isNullAt(i.toInt)) null
        else arr.get(i.toInt, et)
      case MapType(StringType, vt, _) =>
        val m = container.asInstanceOf[MapData]
        val keys = m.keyArray()
        var j = 0
        var out: Any = null
        while (j < m.numElements() && out == null) {
          if (keys.getUTF8String(j) == index.asInstanceOf[UTF8String] &&
            !m.valueArray().isNullAt(j))
            out = m.valueArray().get(j, vt)
          j += 1
        }
        out
      case _ =>
        val s = container.asInstanceOf[UTF8String]
        val n = s.numChars()
        var i = index match { case l: Long => l; case i: Int => i.toLong }
        if (i < 0) i += n
        if (i < 0 || i >= n) null
        else s.substringSQL(i.toInt + 1, 1)
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyIndex =
    copy(left = newLeft, right = newRight)
}

case class PolySlice(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  import PolyAccess.intLike

  override def dataType: DataType = first.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "poly_slice"

  override def checkInputDataTypes(): TypeCheckResult = {
    val boundsOk = Seq(second, third).forall(e =>
      intLike(e.dataType) || e.dataType == NullType)
    first.dataType match {
      case _: ArrayType | StringType if boundsOk =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"slice expects array or string with integer bounds, got ${other.sql}")
    }
  }

  private def asLong(v: Any): Option[Long] = v match {
    case null    => None
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
  }

  override def eval(input: InternalRow): Any = {
    val container = first.eval(input)
    if (container == null) return null
    val sOpt = asLong(second.eval(input))
    val eOpt = asLong(third.eval(input))
    first.dataType match {
      case ArrayType(et, _) =>
        val arr = container.asInstanceOf[ArrayData]
        val n = arr.numElements().toLong
        // negative start = reference's `as usize` (huge) → empty
        val s = sOpt.getOrElse(0L)
        val e = math.min(eOpt.filter(_ >= 0).getOrElse(n), n)
        if (s < 0 || s > e) new GenericArrayData(Array.empty[Any])
        else new GenericArrayData(
          (s until e).map(i => if (arr.isNullAt(i.toInt)) null
          else arr.get(i.toInt, et)).toArray)
      case _ =>
        val str = container.asInstanceOf[UTF8String]
        val n = str.numChars().toLong
        val s = sOpt.getOrElse(0L)
        val e = math.min(eOpt.filter(_ >= 0).getOrElse(n), n)
        if (s < 0 || s > e) UTF8String.EMPTY_UTF8
        else str.substringSQL(s.toInt + 1, (e - s).toInt)
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PolySlice =
    copy(first = f, second = s, third = t)
}

/** `item in container` membership over array values, map keys, or
  * string containment (BinOp::In's three arms).
  */
case class PolyIn(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "poly_in"

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(et, _) if DataType.equalsStructurally(et, left.dataType, ignoreNullability = true) =>
      TypeCheckResult.TypeCheckSuccess
    case MapType(StringType, _, _) | StringType if left.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"'in' expects a matching array, a string-keyed map, or a string, got ${left.dataType.sql} in ${other.sql}")
  }

  override protected def nullSafeEval(item: Any, container: Any): Any =
    right.dataType match {
      case ArrayType(et, _) =>
        val arr = container.asInstanceOf[ArrayData]
        var j = 0
        var found = false
        while (j < arr.numElements() && !found) {
          if (!arr.isNullAt(j) && arr.get(j, et) == item) found = true
          j += 1
        }
        found
      case MapType(StringType, _, _) =>
        val keys = container.asInstanceOf[MapData].keyArray()
        var j = 0
        var found = false
        while (j < keys.numElements() && !found) {
          if (keys.getUTF8String(j) == item.asInstanceOf[UTF8String]) found = true
          j += 1
        }
        found
      case _ =>
        container.asInstanceOf[UTF8String].contains(item.asInstanceOf[UTF8String])
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyIn =
    copy(left = newLeft, right = newRight)
}
