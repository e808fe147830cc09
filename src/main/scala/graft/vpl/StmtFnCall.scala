package graft.vpl

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import VplAst._

/** Per-event evaluation of an imperative VPL statement-fn body
  * (`fn f(x: int) -> int: while …`) applied to EVENT-FIELD arguments
  * — the reference evaluates these bodies per event through its
  * engine evaluator (crates/varpulis-runtime engine; statement
  * grammar varpulis-parser/src/varpulis.pest:347). Constant-argument
  * calls never reach here: [[graft.vpl.VplCompiler]] inlineFns folds
  * them at compile time through the same interpreter
  * ([[VplInterp]]); this expression is the non-constant residue.
  *
  * Spark-first shape (the EmaFold/BreakerReplay native-fold
  * precedent): one tight JVM loop per row behind a hand-written
  * doGenCode, so the enclosing stage stays whole-stage-codegen'd (a
  * CodegenFallback expression would kick the whole operator out of
  * WSCG). The loop is fuel-capped PER ROW ([[StmtFnCall.perRowFuel]]
  * steps) — a runaway `while` fails that row's task loudly instead
  * of hanging an executor.
  *
  * Scalar surface by contract: arguments must be scalar event fields
  * (int/float/str/bool; timestamps pass as epoch micros) and the fn
  * must declare a scalar return type (`-> int|float|str|bool`) — the
  * column type cannot be inferred from a dynamically-typed body. A
  * NULL argument short-circuits to a NULL result (Catalyst null
  * semantics; the reference's dynamic evaluator has no NULL field
  * access to compare against).
  */
case class StmtFnCall(fnName: String, fns: Map[String, VFn],
    dataType: DataType, children: Seq[Expression]) extends Expression {

  override def nullable: Boolean = true
  override def prettyName: String = s"vpl_fn_$fnName"

  /** Per-row interpreter step budget. */
  private val perRowFuel = 1000000L

  private def fromCatalyst(v: Any): Any = v match {
    case null              => null
    case s: UTF8String     => s.toString
    case i: java.lang.Integer => i.longValue
    case s: java.lang.Short   => s.longValue
    case b: java.lang.Byte    => b.longValue
    case f: java.lang.Float   => f.doubleValue
    case d: Decimal        => d.toDouble
    case l: java.lang.Long    => l
    case d: java.lang.Double  => d
    case b: java.lang.Boolean => b
    case other => throw VplInterp.InterpError(
      s"fn $fnName: argument ${other.getClass.getSimpleName} is not a " +
        "scalar — per-event imperative calls take int/float/str/bool " +
        "event fields")
  }

  private def toCatalyst(v: Any): Any = (v, dataType) match {
    case (null, _)                => null
    case (l: Long, LongType)      => l
    case (d: Double, LongType) if d == math.floor(d) &&
        math.abs(d) <= Long.MaxValue.toDouble => d.toLong
    case (d: Double, DoubleType)  => d
    case (l: Long, DoubleType)    => l.toDouble
    case (s: String, StringType)  => UTF8String.fromString(s)
    case (l: Long, StringType)    => UTF8String.fromString(l.toString)
    case (d: Double, StringType)  => UTF8String.fromString(d.toString)
    case (b: Boolean, StringType) => UTF8String.fromString(b.toString)
    case (b: Boolean, BooleanType) => b
    case (other, dt) => throw VplInterp.InterpError(
      s"fn $fnName declared -> ${dt.simpleString} but returned $other")
  }

  /** Bounded LRU memo on the argument tuple: statement-fn bodies are
    * pure (no event-external state in the interpreter), so equal args
    * give equal results, and real feeds repeat them heavily (x8's
    * seed has 97 distinct values across 10k events). The key is built
    * from the CONVERTED args (String/Long/Double/Boolean — immutable
    * copies; the raw UTF8String from codegen may alias a reused row
    * buffer and must never be stored). Per deserialized task instance
    * (transient lazy), synchronized because interpreted-mode eval can
    * share an instance across threads.
    */
  @transient private lazy val memo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[AnyRef, AnyRef](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[AnyRef, AnyRef]): Boolean =
          size() > StmtFnCall.memoCap
      })

  /** Row-level entry: boxed Catalyst argument values in, boxed
    * Catalyst result out (null on any null argument). Public for the
    * generated code.
    */
  def invoke(args: Array[Object]): Any = {
    var i = 0
    while (i < args.length) {
      if (args(i) == null) return null
      i += 1
    }
    val conv = args.map(fromCatalyst)
    val key: AnyRef = conv.toList
    val hit = memo.get(key)
    if (hit != null) {
      if (hit eq StmtFnCall.NullResult) null else hit
    } else {
      val res = toCatalyst(VplInterp.callFn(fns, fns(fnName),
        conv.toSeq, perRowFuel))
      memo.put(key,
        if (res == null) StmtFnCall.NullResult else res.asInstanceOf[AnyRef])
      res
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    invoke(children.map(_.eval(input).asInstanceOf[Object]).toArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("stmtFn", this, classOf[StmtFnCall].getName)
    val argsArr = ctx.freshName("stmtArgs")
    val res = ctx.freshName("stmtRes")
    val evals = children.map(_.genCode(ctx))
    val fill = evals.zipWithIndex.map { case (e, i) =>
      code"""
        |${e.code}
        |$argsArr[$i] = ${e.isNull} ? null : (Object) ${e.value};"""
    }.reduce(_ + _)
    val unbox = dataType match {
      case LongType    => s"((java.lang.Long) $res).longValue()"
      case DoubleType  => s"((java.lang.Double) $res).doubleValue()"
      case BooleanType => s"((java.lang.Boolean) $res).booleanValue()"
      case _           => s"(${CodeGenerator.boxedType(dataType)}) $res"
    }
    ev.copy(code =
      code"""
        |Object[] $argsArr = new Object[${children.size}];
        |$fill
        |Object $res = $self.invoke($argsArr);
        |boolean ${ev.isNull} = $res == null;
        |${CodeGenerator.javaType(dataType)} ${ev.value} =
        |  ${CodeGenerator.defaultValue(dataType)};
        |if (!${ev.isNull}) { ${ev.value} = $unbox; }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StmtFnCall =
    copy(children = newChildren)
}

object StmtFnCall {
  /** LRU entry cap — small enough to be memory-trivial per task,
    * large enough to cover realistic low-cardinality argument
    * domains.
    */
  val memoCap: Int = 4096

  /** Stored in the memo for a legitimately-null result (a raw null
    * value would read as a miss).
    */
  private[vpl] object NullResult
}
