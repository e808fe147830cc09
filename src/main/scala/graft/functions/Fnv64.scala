package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** FNV-1a 64-bit hash of a string column as a native codegen'd
  * expression. Used as the deterministic row-hash for stratified
  * sampling and shard assignment: unlike Spark's `hash`/`xxhash64`
  * builtins its definition is engine-independent (a 9-line byte fold),
  * so an external system — or the DuckDB oracle — can re-derive every
  * decision bit for bit. Same primitive the SimHash/MinHash family
  * already uses ([[SimHashUtil.fnv64]]).
  */
case class Fnv64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.fnv64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashUtil.fnv64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64 =
    copy(child = newChild)
}

object Fnv64 {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def apply(c: Column): Column =
    ColumnBridge.column(Fnv64(ColumnBridge.expression(c)))

  /** The hash value reinterpreted as unsigned 64-bit, mod `m`.
    * Signed two's-complement arithmetic only: for x < 0 the unsigned
    * value is x + 2^64, so u mod m = (pmod(x, m) + 2^64 mod m) mod m.
    * Integer-exact — the oracle computes the same residue on UBIGINT.
    */
  def unsignedMod(h: Column, m: Long): Column = {
    import org.apache.spark.sql.functions._
    val wrap = java.math.BigInteger.ONE.shiftLeft(64)
      .mod(java.math.BigInteger.valueOf(m)).longValueExact()
    pmod(pmod(h, lit(m)) + when(h < 0, lit(wrap)).otherwise(lit(0L)), lit(m))
  }
}
