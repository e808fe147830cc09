package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word k-gram shingles as a native single-pass expression.
  *
  * The pure-`Column` formulation (transform over sequence + slice +
  * concat_ws + array_distinct) runs interpreted lambda HOFs —
  * profiled at ~50µs per shingle, it dominated every dedup operator.
  * This expression emits one codegen'd static call doing a single
  * array walk with a dedup hash set.
  *
  * Semantics (must stay aligned with the DuckDB oracle twin in
  * TextQueries.shinglesSql): k consecutive words joined by a single
  * space, first-occurrence order, deduplicated; fewer than k words →
  * one shingle of all words joined.
  */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  def shingles(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n < k) {
      val all = new Array[UTF8String](n)
      var i = 0
      while (i < n) { all(i) = words.getUTF8String(i); i += 1 }
      out.add(UTF8String.concatWs(Space, all: _*))
    } else {
      val win = new Array[UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        while (j < k) { win(j) = words.getUTF8String(i + j); j += 1 }
        out.add(UTF8String.concatWs(Space, win: _*))
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

object PositionalShingleUtil {
  private val Space = UTF8String.fromString(" ")

  /** ALL k-grams in order (no dedup) — element i is the gram starting
    * at word i, so `posexplode` over the result yields (start, gram)
    * directly. Docs shorter than k yield an empty array: no k-gram
    * exists, so span-level dedup has nothing to mark.
    */
  def positional(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val win = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) { win(j) = words.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, win: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Positional (non-distinct) variant of [[WordShingles]] for
  * span-level operators that need gram START OFFSETS, not just the
  * gram set — same single-pass native form, same oracle-twin
  * alignment duty (TextQueries d9).
  */
case class PositionalShingles(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "positional_shingles"

  override protected def nullSafeEval(input: Any): Any =
    PositionalShingleUtil.positional(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PositionalShingleUtil.positional($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PositionalShingles =
    copy(child = newChild)
}

case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
