package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math as pure Catalyst higher-order-function
  * expressions (codegen-compatible, no UDFs). Computation is an
  * explicit in-order left fold so results are bit-deterministic —
  * required for the oracle hash compare and for reproducible dedup
  * decisions across cluster re-runs.
  */
object VectorFunctions {

  /** elementwise products summed left-to-right in double precision
    * (native codegen'd expression; see [[DotProduct]])
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane signature for LSH
    * bucketing: bit i = sign of the dot product with a hyperplane
    * whose components are derived from xxhash64(i, dim) — no RNG
    * state, identical on every executor and every run.
    */
  def hyperplaneSig(vec: Column, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) => {
          // hash-derived pseudo-gaussian component in [-0.5, 0.5)
          val h = xxhash64(lit(i), j)
          x.cast("double") * ((h % 1000000L).cast("double") / 2000000.0)
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
