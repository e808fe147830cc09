package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right BPE merge round applied to a word's
  * symbol array: every adjacent pair exactly equal to (a, b) becomes
  * the single symbol a+b, scanning left to right without overlap
  * (Sennrich et al. 2016 semantics; reference anchor: the tokenizer
  * induction the reference's scoring pipeline presumes).
  *
  * This replaces the earlier separator-join + literal `replace`
  * formulation, which had a correctness hole once multi-character
  * symbols exist: `replace('the', 'he', 'he')` matches
  * INSIDE the symbol "th", collapsing [th, e] to [the] under the rule
  * (h, e) — a merge the rule never named. The row-local array walk
  * compares whole symbols only, so no such cross-boundary match can
  * occur, and it is O(n) per word with zero string re-joining.
  */
object BpeMergeUtil {
  def merge(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return syms
    val out = new Array[Any](n)
    var o = 0
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && cur.equals(a) && syms.getUTF8String(i + 1).equals(b)) {
        out(o) = UTF8String.concat(a, b)
        o += 1
        i += 2 // greedy non-overlapping: the merged pair is consumed whole
      } else {
        out(o) = cur
        o += 1
        i += 1
      }
    }
    if (o == n) syms
    else new GenericArrayData(java.util.Arrays.copyOfRange(
      out.asInstanceOf[Array[AnyRef]], 0, o).asInstanceOf[Array[Any]])
  }
}

case class BpeMerge(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_merge"

  private lazy val ua = UTF8String.fromString(a)
  private lazy val ub = UTF8String.fromString(b)

  override protected def nullSafeEval(syms: Any): Any =
    BpeMergeUtil.merge(syms.asInstanceOf[ArrayData], ua, ub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", ua, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("bpeB", ub, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev,
      s => s"graft.functions.BpeMergeUtil.merge($s, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}
