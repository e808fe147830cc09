package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash signature over a shingle array.
  *
  * A native Catalyst expression (not N higher-order-function folds):
  * the pure-`Column` formulation — `array_min(transform(sh,
  * xxhash64(s, seed)))` per seed — walks the shingle array once per
  * hash function through an interpreted lambda (HOFs are excluded
  * from whole-stage codegen), i.e. 16 interpreted traversals per
  * document. This expression makes ONE traversal, updating all nH
  * running minima per shingle, emitted through codegen via a static
  * helper. Hash family i is FNV-1a of the UTF-8 bytes seeded by
  * mixing i into the offset basis — deterministic across
  * executors/runs (same property the seeded-xxhash64 family had).
  *
  * Reference semantics: varpulis-core minhash signatures (band/row
  * LSH); the hash family choice is an implementation detail — any
  * fixed family of independent-ish 64-bit hashes works.
  */
object MinHashUtil {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  // golden-ratio odd constant for seed mixing (splitmix64 increment)
  private final val SeedMix = 0x9e3779b97f4a7c15L

  /** One pass over the shingle array: per element, hash once with
    * FNV-1a, then derive the nH family members by a cheap splitmix64
    * finalizer over (h ^ (seed · mix)) — avoids re-reading the bytes
    * per seed while keeping the family members decorrelated.
    */
  def minhashSig(shingles: ArrayData, nHashes: Int): ArrayData = {
    val mins = new Array[Long](nHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val bytes = shingles.getUTF8String(i).getBytes
        var h = FnvOffset
        var k = 0
        while (k < bytes.length) {
          h ^= (bytes(k) & 0xffL)
          h *= FnvPrime
          k += 1
        }
        var s = 0
        while (s < nHashes) {
          // splitmix64 finalizer on (h ^ seed·mix)
          var z = h ^ (s.toLong * SeedMix)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          if (z < mins(s)) mins(s) = z
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class MinHashSig(child: Expression, nHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.minhashSig(input.asInstanceOf[ArrayData], nHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashUtil.minhashSig($c, $nHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
