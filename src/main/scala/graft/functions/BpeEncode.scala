package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer APPLICATION: encode a document's word array into
  * subword tokens using a trained merge table (Sennrich et al. 2016
  * apply step; the GPT-2 reference implementation's loop) — the
  * row-local second half of [[graft.text.TextAnalysis.bpeTrain]].
  *
  * Per word: start from single characters, repeatedly pick the
  * adjacent pair with the LOWEST merge rank present in the table and
  * merge all its occurrences greedily left-to-right (the same
  * whole-symbol semantics as [[BpeMergeUtil.merge]], which training
  * uses — so encode(word) reproduces exactly the symbol sequence
  * training would have produced for that word), until no adjacent
  * pair is in the table.
  *
  * The merge table is a driver-side constructor param broadcast as a
  * codegen reference object — vocab-sized (≤ tens of thousands of
  * rules), the same "model as literal" pattern as the DSIR/BM25
  * ingest twins. One JVM loop per word, no Catalyst lambdas; at
  * 100 TB this is a pure map stage, trivially partition-parallel.
  */
object BpeEncodeUtil {

  /** rank lookup key — the U+0001 separator cannot occur inside symbols derived
    * from [a-z0-9] words
    */
  @inline private def key(a: String, b: String): String =
    a + "\u0001" + b

  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.put(key(a, b), Integer.valueOf(r))
    }
    m
  }

  /** Encode one word; returns its symbol list after all applicable
    * merges, lowest-rank-first, each applied greedy left-to-right.
    */
  def encodeWord(w: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var syms: Array[String] = w.toCharArray.map(_.toString)
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the table
      var best = -1
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(key(syms(i), syms(i + 1)))
        if (r != null && (best < 0 || r.intValue() < best)) {
          best = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (best < 0) done = true
      else {
        // merge ALL occurrences of the best pair, greedy L-to-R —
        // identical application semantics to training's BpeMerge
        val out = new Array[String](syms.length)
        var o = 0
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == bestA && syms(j + 1) == bestB) {
            out(o) = bestA + bestB; o += 1; j += 2
          } else { out(o) = syms(j); o += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, o)
        done = syms.length < 2
      }
    }
    syms
  }

  def encode(words: ArrayData,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val toks = encodeWord(words.getUTF8String(i).toString, ranks)
        var j = 0
        while (j < toks.length) {
          out += UTF8String.fromString(toks(j)); j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks = BpeEncodeUtil.rankMap(merges)

  override protected def nullSafeEval(words: Any): Any =
    BpeEncodeUtil.encode(words.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeEncodeUtil.encode($c, $r)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
