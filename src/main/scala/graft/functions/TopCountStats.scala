package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mode-count statistics of a string array, row-locally: returns
  * struct<top: bigint, n: bigint> where `top` is the occurrence count
  * of the most frequent element and `n` the element count.
  *
  * This replaces t6_repetition's explode → groupBy(doc_id, bigram) →
  * groupBy(doc_id) → join-back pipeline (guide §2.4 "remove shuffles
  * outright"): the per-document bigram mode never needed a shuffle —
  * every document's verdict depends only on its own row. At 100 TB
  * the old shape exchanged one row PER TOKEN (the corpus's largest
  * possible shuffle); this is a pure map over the scan.
  *
  * Exactness: counts are exact longs from a per-row hash map — the
  * same integers the distributed count produced, so the DuckDB
  * oracle hash is unchanged. Null elements are not expected (the
  * caller filters them) but are skipped defensively, matching what
  * explode-then-count produced for them upstream.
  */
object TopCountStatsUtil {
  def eval(xs: ArrayData): InternalRow = {
    val n = xs.numElements()
    val counts = new java.util.HashMap[UTF8String, Long](Math.max(16, n * 2))
    var top = 0L
    var total = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val s = xs.getUTF8String(i)
        val c = counts.merge(s, 1L, (a, b) => a + b)
        if (c > top) top = c
        total += 1
      }
      i += 1
    }
    InternalRow(top, total)
  }
}

case class TopCountStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "top_count_stats"

  override protected def nullSafeEval(xs: Any): Any =
    TopCountStatsUtil.eval(xs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.TopCountStatsUtil.eval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
