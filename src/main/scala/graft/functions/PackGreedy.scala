package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Next-fit greedy sequence packing — the training-data step that
  * concatenates documents into fixed-token-budget context windows
  * (one "bin" = one training sequence). Docs are consumed in id order
  * within a shard; a doc that no longer fits closes the bin and opens
  * the next one. An oversize doc (tok > budget) occupies a bin alone
  * — it is never split, matching how packing pipelines delegate
  * splitting to the downstream tokenizer.
  *
  * The fold is inherently sequential per shard (each placement
  * depends on the running fill), so it runs as one native O(n) pass
  * over the shard's sorted doc list — the same per-group shape as
  * [[BreakerReplay]] / [[GretaDp]]. Shards are the parallel unit:
  * the shard count scales with the corpus, each group holds n/S docs,
  * and the only exchange is the one shuffle onto the shard key.
  *
  * Input: array<struct<doc_id:long, tok:long>> sorted by doc_id.
  * Output: one struct per doc (doc_id, bin, bin_used) where `bin` is
  * the 0-based sequence number within the shard and `bin_used` the
  * bin's token fill AFTER placing the doc (making every greedy
  * decision oracle-checkable by a linear recursive CTE).
  */
object PackGreedyUtil {

  /** One greedy placement — the single source of truth shared by the
    * batch expression below and the streaming twin
    * (StreamingQueries.streamPack), so the two paths cannot diverge.
    * Returns (bin', used') after placing a `tok`-token doc.
    */
  def step(bin: Long, used: Long, tok: Long, budget: Long): (Long, Long) =
    if (used == 0L || used + tok <= budget) (bin, used + tok)
    else (bin + 1L, tok)

  def pack(docs: ArrayData, budget: Long): ArrayData = {
    val n = docs.numElements()
    val out = new Array[Any](n)
    var bin = 0L
    var used = 0L
    var i = 0
    while (i < n) {
      val st = docs.getStruct(i, 2)
      val id = st.getLong(0)
      val tok = st.getLong(1)
      val (b2, u2) = step(bin, used, tok, budget)
      bin = b2; used = u2
      out(i) = new GenericInternalRow(Array[Any](id, bin, used))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class PackGreedy(child: Expression, budget: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("bin", LongType, nullable = false),
    StructField("bin_used", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pack_greedy"

  override protected def nullSafeEval(input: Any): Any =
    PackGreedyUtil.pack(input.asInstanceOf[ArrayData], budget)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PackGreedyUtil.pack($c, ${budget}L)")

  override protected def withNewChildInternal(newChild: Expression): PackGreedy =
    copy(child = newChild)
}
