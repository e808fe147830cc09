package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local benchmark-gram probe for ingest-time decontamination
  * (streaming twin of Dedup.decontaminate): given a doc's DISTINCT
  * shingle array, count how many land in the benchmark's FNV-hashed
  * gram set — binary search against a sorted long[] riding as a
  * codegen reference object (eval sets are small by nature, the d6
  * broadcast argument; here the broadcast IS the model object).
  * Returns array<long> [n_grams, n_hits]. No explode, no join, no
  * shuffle, no state — an arriving doc is cleared or flagged before
  * it lands.
  */
object GramSetHitsUtil {
  def probe(shingles: ArrayData, sorted: Array[Long]): ArrayData = {
    val n = shingles.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      val h = SimHashUtil.fnv64(shingles.getUTF8String(i).getBytes)
      if (java.util.Arrays.binarySearch(sorted, h) >= 0) hits += 1
      i += 1
    }
    new GenericArrayData(Array[Any](n.toLong, hits))
  }
}

case class GramSetHits(child: Expression, sorted: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_set_hits"

  override protected def nullSafeEval(input: Any): Any =
    GramSetHitsUtil.probe(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("benchGrams", sorted, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramSetHitsUtil.probe($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSetHits =
    copy(child = newChild)
}
