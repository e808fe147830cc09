package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local DSIR scorer for the STREAMING path (see
  * TextAnalysis.dsirWeights for the batch fit): one pass over a doc's
  * word array computing Σ lr[bucket(gram)] over word uni+bigrams,
  * with the fitted per-bucket log-ratios attached as a codegen
  * reference object of SCALED LONGS (the DECIMAL(18,9) unscaled
  * values — long addition is exact and order-independent, so the
  * stream total is bit-identical to the batch decimal sum).
  *
  * Bigram hashes are computed incrementally (continue the FNV-1a fold
  * of word i with a space byte and word i+1) — no gram string is ever
  * allocated, where the batch path materializes grams only to shuffle
  * COUNT them. An interpreted-HOF formulation would pay ~50µs per
  * gram (the repetitionStats measurement); this is one tight loop.
  *
  * Returns array<long> [n_grams, scaled_sum] ([0, 0] for docs with no
  * words — the caller drops them to match the batch inner-join
  * semantics).
  */
object DsirScoreUtil {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val SpaceByte = ' '.toByte

  private def fold(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def score(words: ArrayData, scaledLr: Array[Long]): ArrayData = {
    val n = words.numElements()
    val m = scaledLr.length
    var sum = 0L
    var grams = 0L
    var prevHash = 0L // fold state of word i-1 (before termination)
    var i = 0
    while (i < n) {
      val b = words.getUTF8String(i).getBytes
      val h = fold(FnvOffset, b)
      sum += scaledLr(java.lang.Long.remainderUnsigned(h, m).toInt)
      grams += 1
      if (i > 0) {
        // bigram (w[i-1], w[i]): continue w[i-1]'s fold through ' '
        var hb = prevHash
        hb ^= (SpaceByte & 0xffL)
        hb *= FnvPrime
        hb = fold(hb, b)
        sum += scaledLr(java.lang.Long.remainderUnsigned(hb, m).toInt)
        grams += 1
      }
      prevHash = h
      i += 1
    }
    new GenericArrayData(Array[Any](grams, sum))
  }
}

case class DsirScore(child: Expression, scaledLr: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_score"

  override protected def nullSafeEval(input: Any): Any =
    DsirScoreUtil.score(input.asInstanceOf[ArrayData], scaledLr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lrRef = ctx.addReferenceObj("scaledLr", scaledLr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DsirScoreUtil.score($c, $lrRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}
