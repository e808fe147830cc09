package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProduct, EmaFold, GretaDp, HawkesFold, HyperplaneSig, MinHashSig, SimHash64, WordShingles}

/** graft's native expressions as SQL functions. */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(GraftFunctions.getClass.getName, name, usage)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(words, k) - distinct word k-grams"),
      (args: Seq[Expression]) => args match {
        case Seq(words, Literal(k: Int, _)) => WordShingles(words, k)
        case _ => throw new IllegalArgumentException(
          "word_shingles(words, k): k must be an integer literal")
      }),
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - in-order double dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, n) - n-long MinHash signature"),
      (args: Seq[Expression]) => args match {
        case Seq(sh, Literal(n: Int, _)) => MinHashSig(sh, n)
        case _ => throw new IllegalArgumentException(
          "minhash_sig(shingles, n): n must be an integer literal")
      }),
    (FunctionIdentifier("greta_dp"),
      info("greta_dp",
        "greta_dp(evs) - (count_trends, sum_trends) GRETA DP over a " +
          "sorted array<struct<o, v: double>>"),
      (args: Seq[Expression]) => GretaDp(args.head)),
    (FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig", "hyperplane_sig(vec, nBits) - LSH hyperplane signature"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(n: Int, _)) => HyperplaneSig(v, n)
        case _ => throw new IllegalArgumentException(
          "hyperplane_sig(vec, nBits): nBits must be an integer literal")
      }),
    (FunctionIdentifier("ema_fold"),
      info("ema_fold",
        "ema_fold(xs, a, b) - in-order a*x + b*acc fold over a sorted " +
          "array<struct<order, v: double>>"),
      (args: Seq[Expression]) => args match {
        case Seq(xs, NumericLit(a), NumericLit(b)) => EmaFold(xs, a, b)
        case _ => throw new IllegalArgumentException(
          "ema_fold(xs, a, b): a and b must be numeric literals")
      }),
    (FunctionIdentifier("hawkes_fold"),
      info("hawkes_fold",
        "hawkes_fold(evs, mu, alpha, beta) - Hawkes intensity recursion " +
          "over a sorted array<struct<o: bigint, t_us: bigint>>"),
      (args: Seq[Expression]) => args match {
        case Seq(evs, NumericLit(mu), NumericLit(al), NumericLit(be)) =>
          HawkesFold(evs, mu, al, be)
        case _ => throw new IllegalArgumentException(
          "hawkes_fold(evs, mu, alpha, beta): params must be numeric literals")
      }))

  /** Any numeric literal as a Double: Spark's SQL parser types a bare
    * `0.2` as DECIMAL(1,1), not DOUBLE, so matching only
    * Literal(Double) forced users to write `0.2D` and failed with a
    * message that never said so. Folded constant expressions
    * (`1.0/8`) still need the D-suffix form — only literals reach a
    * function builder unevaluated.
    */
  private object NumericLit {
    def unapply(e: Expression): Option[Double] = e match {
      case Literal(v, _) => v match {
        case d: Double => Some(d)
        case f: Float => Some(f.toDouble)
        case i: Int => Some(i.toDouble)
        case l: Long => Some(l.toDouble)
        case s: Short => Some(s.toDouble)
        case b: Byte => Some(b.toDouble)
        case dec: org.apache.spark.sql.types.Decimal => Some(dec.toDouble)
        case _ => None
      }
      case _ => None
    }
  }

  /** Register into a live session (tests, shells). */
  def register(spark: SparkSession): Unit = all.foreach { case (id, inf, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
  }
}

/** SQL-surface registration for graft's native expressions, so
  * `spark.sql("SELECT simhash64(...)")` works next to the Column API
  * (`SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
