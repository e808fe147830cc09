package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local bigram-LM scorer for the STREAMING path (see
  * TextAnalysis.lmFluency for the batch fit+join formulation): one
  * pass over a doc's word array accumulating the Q14 stupid-backoff
  * probability of each adjacent pair, with the fitted model attached
  * as codegen reference objects — a bigram map ("w1 w2" →
  * [cnt2, cnt1(w1)]), a unigram map (w → cnt), and the total token
  * count. Every step is the SAME integer arithmetic as the batch
  * joins ((cnt2·16384) div cnt1w1; backoff (2·16384·cnt(w2)) div
  * (5·T); long division truncates and all operands are non-negative,
  * so it equals the oracle's flooring //), and long sums commute —
  * so the stream total is bit-identical to the batch one and the
  * twin shares t17's oracle verbatim.
  *
  * O(1) hash lookups per bigram (java.util.HashMap), no joins, no
  * shuffle: the model is driver-fit once on the static reference
  * slice (cap-guarded) and ships once per executor. Returns
  * array<long> [n_bigrams, sum_q] ([0,0] for docs with < 2 words —
  * the caller drops them to match the batch explode semantics).
  */
object LmScoreUtil {
  def score(words: ArrayData,
      bi: java.util.HashMap[String, Array[Long]],
      uni: java.util.HashMap[String, java.lang.Long],
      total: Long): ArrayData = {
    val n = words.numElements()
    var sum = 0L
    var i = 1
    var prev: String = if (n > 0) words.getUTF8String(0).toString else null
    while (i < n) {
      val cur = words.getUTF8String(i).toString
      val b = bi.get(prev + " " + cur)
      if (b != null) sum += (b(0) * 16384L) / b(1)
      else {
        val u = uni.get(cur)
        if (u != null) sum += (32768L * u.longValue()) / (5L * total)
        // unseen w2: q = 0, matching the batch coalesce(cntw2, 0)
      }
      prev = cur
      i += 1
    }
    new GenericArrayData(Array[Any](math.max(n - 1, 0).toLong, sum))
  }
}

case class LmScore(child: Expression,
    bi: java.util.HashMap[String, Array[Long]],
    uni: java.util.HashMap[String, java.lang.Long],
    total: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lm_score"

  override protected def nullSafeEval(input: Any): Any =
    LmScoreUtil.score(input.asInstanceOf[ArrayData], bi, uni, total)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val biRef = ctx.addReferenceObj("bi", bi, "java.util.HashMap")
    val uniRef = ctx.addReferenceObj("uni", uni, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LmScoreUtil.score($c, $biRef, $uniRef, ${total}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}
