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
    * whose components are derived from splitmix64((i << 32) | dim) —
    * no RNG state, identical on every executor and every run, and
    * oracle-reproducible. Native single-pass expression (see
    * [[HyperplaneSig]]).
    */
  def hyperplaneSig(vec: Column, nBits: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HyperplaneSig(ColumnBridge.expression(vec), nBits))
  }
}
