package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized word tokens as ONE native pass — the hot inner loop of
  * every tokenizing operator (Jaccard/MinHash/SimHash dedup, t6/t9
  * quality, t10 packing, t11 BM25, pipe1).
  *
  * The pure-`Column` formulation chains lower → regexp_replace
  * ([^a-z0-9 ]→' ') → regexp_replace (' +'→' ') → trim → split →
  * filter(_ != ""): two full regex passes, a split allocation and an
  * interpreted HOF filter per row. Net semantics of that chain:
  * tokens = maximal runs of [a-z0-9] in the lowercased string. This
  * expression computes exactly that in one byte walk over the
  * lowercased UTF-8 (token characters are pure ASCII, so every
  * multi-byte sequence is a separator byte-wise — no decoding
  * needed), with `UTF8String.toLowerCase` doing the SAME Unicode
  * lowering the `lower()` function applies. TextSpec pins
  * equivalence against the composed-Column chain on the corpus and
  * on adversarial Unicode strings.
  */
object NormalizedWordsUtil {

  def tokens(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    val n = bytes.length
    var i = 0
    var start = -1
    while (i < n) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }
}

case class NormalizedWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "normalized_words"

  override protected def nullSafeEval(input: Any): Any =
    NormalizedWordsUtil.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NormalizedWordsUtil.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizedWords =
    copy(child = newChild)
}
