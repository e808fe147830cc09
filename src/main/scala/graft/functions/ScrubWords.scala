package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass span-scrub rebuild for Dedup.scrubSpans: given a doc's
  * word array and the start offsets of its corpus-duplicated k-grams,
  * mark the covered positions and emit (n_kept, scrubbed_text)
  * directly.
  *
  * This replaces the relational tail the first d9 formulation used —
  * posexplode of EVERY word, an (doc, pos) anti-join against the
  * exploded covered offsets, and an array_sort(collect_list) rollup —
  * with one row-local O(n + |starts|·k) walk after a per-doc
  * collect_list of the (few) dup starts. Cuts two corpus-sized
  * exchanges and the per-doc sort from the plan; measured 4.4s → see
  * SURVEY §15 for the number at sf0.1.
  */
object ScrubWordsUtil {
  private val Space = UTF8String.fromString(" ")

  def scrub(words: ArrayData, starts: ArrayData, k: Int): InternalRow = {
    val n = words.numElements()
    val covered = new Array[Boolean](n)
    var i = 0
    val m = starts.numElements()
    while (i < m) {
      val s = starts.getLong(i).toInt
      var j = if (s < 0) 0 else s
      val e = math.min(s + k, n)
      while (j < e) { covered(j) = true; j += 1 }
      i += 1
    }
    var kept = 0
    i = 0
    while (i < n) { if (!covered(i)) kept += 1; i += 1 }
    val arr = new Array[UTF8String](kept)
    var o = 0
    i = 0
    while (i < n) {
      if (!covered(i)) { arr(o) = words.getUTF8String(i); o += 1 }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      kept.toLong, UTF8String.concatWs(Space, arr: _*)))
  }
}

case class ScrubWords(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("txt", StringType, nullable = false)))
  override def prettyName: String = "scrub_words"

  override protected def nullSafeEval(words: Any, starts: Any): Any =
    ScrubWordsUtil.scrub(
      words.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, s) => s"graft.functions.ScrubWordsUtil.scrub($w, $s, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubWords =
    copy(left = newLeft, right = newRight)
}
