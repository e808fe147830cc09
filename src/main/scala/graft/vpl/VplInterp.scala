package graft.vpl

import VplAst._

/** Compile-time interpreter for imperative VPL statement-fn bodies —
  * the `let` / `:=` / `while` / `if` / `for` / `return` / `break` /
  * `continue` subset of the reference grammar
  * (varpulis-parser/src/varpulis.pest statement rules; exercised by
  * crates/varpulis-runtime/benches/imperative_benchmark.rs).
  *
  * Spark-first rationale: the reference interprets these bodies PER
  * EVENT at runtime. Every reference benchmark calls them with
  * compile-time-constant arguments (`sum_range(1000)`,
  * `factorial(10)`, nullary array/map/math/string fns), so their
  * value is a per-event CONSTANT — the honest Spark realization is to
  * evaluate ONCE here and plant a literal in the plan, keeping the
  * hot path pure codegen. Calls with non-constant (event-field) args
  * stay outside the compiled subset and fail pointedly — except
  * single-return bodies, which the parser desugars to expression fns
  * that inline into Catalyst (e.g. `fn double(x): return x * 2`).
  *
  * Fuel-capped (default 10M steps) so a runaway `while` fails loudly
  * at compile time instead of hanging the planner.
  */
object VplInterp {

  final case class InterpError(msg: String)
      extends RuntimeException(s"VPL fn interpreter: $msg")

  private final class Fuel(var n: Long) {
    def tick(): Unit = {
      n -= 1
      if (n <= 0) throw InterpError(
        "fuel exhausted (runaway while/recursion? the compile-time " +
          "interpreter caps at 10M steps)")
    }
  }

  private case object BreakEx extends RuntimeException
  private case object ContinueEx extends RuntimeException
  private final case class ReturnEx(v: Any) extends RuntimeException

  /** All-constant argument extraction: Some(values) when every arg is
    * a literal the interpreter can take as a value.
    */
  def constArgs(args: Seq[VExpr]): Option[Seq[Any]] = {
    val vals = args.map(constOf)
    if (vals.forall(_.isDefined)) Some(vals.map(_.get)) else None
  }

  private def constOf(e: VExpr): Option[Any] = e match {
    case VInt(v)      => Some(v)
    case VNum(v)      => Some(v)
    case VStr(s)      => Some(s)
    case VBool(b)     => Some(b)
    case VNull        => Some(null)
    case VUn("-", x)  => constOf(x).collect {
      case l: java.lang.Long   => -l.longValue
      case d: java.lang.Double => -d.doubleValue
    }
    // constant arithmetic folds too: the declaration-loop demos pass
    // `{col} * 250`, which lands here as a VBin over literals
    case VBin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      (constOf(l), constOf(r)) match {
        case (Some(a: java.lang.Long), Some(b: java.lang.Long))
            if !((op == "/" || op == "%") && b.longValue == 0L) =>
          Some(op match {
            case "+" => a.longValue + b.longValue
            case "-" => a.longValue - b.longValue
            case "*" => a.longValue * b.longValue
            case "/" => a.longValue / b.longValue
            case _   => a.longValue % b.longValue
          })
        case _ => None
      }
    case VList(items) =>
      val vs = items.map(constOf)
      if (vs.forall(_.isDefined)) Some(vs.map(_.get)) else None
    case VStruct(items) =>
      val vs = items.map { case (k, x) => k -> constOf(x) }
      if (vs.forall(_._2.isDefined))
        Some(vs.map { case (k, o) => k -> o.get }.toMap)
      else None
    case _ => None
  }

  /** Builtins the COMPILE-TIME const-folder may evaluate: only the
    * list/map-shaped forms Catalyst's compiled vocabulary cannot
    * express (a Seq/Map-valued constant has no column translation).
    * Scalar builtins (round, abs, len-of-string, …) are deliberately
    * NOT folded — their Catalyst translations carry the engine/oracle
    * parity semantics and must stay in the plan.
    */
  def tryFold(name: String, vals: Seq[Any]): Option[Any] =
    (name, vals) match {
      case ("range", Seq(_: Long)) |
           ("range", Seq(_: Long, _: Long)) => Some(builtin(name, vals))
      case (("sum" | "sort" | "first" | "last" | "len" | "min" | "max" |
             "reverse"), Seq(_: Seq[_])) => Some(builtin(name, vals))
      case ("contains", Seq(_: Seq[_], _)) => Some(builtin(name, vals))
      case ("join", Seq(_: Seq[_], _: String)) => Some(builtin(name, vals))
      case (("keys" | "values" | "len"), Seq(_: Map[_, _])) =>
        Some(builtin(name, vals))
      case _ => None
    }

  /** Const map/list indexing for the folder (`{"a": 1}["a"]`). */
  def indexConst(target: Any, key: Any): Option[Any] = (target, key) match {
    case (m: Map[_, _], k) =>
      Some(m.asInstanceOf[Map[Any, Any]].getOrElse(k,
        throw InterpError(s"map has no key $k")))
    case (xs: Seq[_], k: Long) =>
      if (k < 0 || k >= xs.length)
        throw InterpError(s"index $k out of range (${xs.length})")
      Some(xs(k.toInt))
    case _ => None
  }

  /** Interpreted value → literal AST node, re-entering the compiled
    * expression world.
    */
  def toExpr(v: Any): VExpr = v match {
    case null                => VNull
    case l: Long             => VInt(l)
    case i: Int              => VInt(i.toLong)
    case d: Double           => VNum(d)
    case s: String           => VStr(s)
    case b: Boolean          => VBool(b)
    case xs: Seq[_]          => VList(xs.map(toExpr))
    case m: Map[_, _]        => VStruct(m.toSeq.map { case (k, x) =>
      k.toString -> toExpr(x) })
    case other => throw InterpError(s"unrepresentable result $other")
  }

  /** Run one statement fn with the given argument values. */
  def callFn(fns: Map[String, VFn], fn: VFn, args: Seq[Any]): Any =
    callFn(fns, fn, args, new Fuel(10000000L), depth = 0)

  /** [[callFn]] with a caller-chosen fuel budget — the PER-ROW entry
    * point of [[StmtFnCall]], where a runaway body must fail after a
    * bounded number of steps on that row rather than consume the
    * compile-time allowance.
    */
  def callFn(fns: Map[String, VFn], fn: VFn, args: Seq[Any],
      fuelSteps: Long): Any =
    callFn(fns, fn, args, new Fuel(fuelSteps), depth = 0)

  /** Interpret a statement fn with CONSTANT argument values,
    * collecting `emit` statements in execution order — the `.process`
    * path for bodies beyond the pure for/emit shape (the mandelbrot
    * demos' compute_tile: lets, := accumulation, nested statement-fn
    * calls, while loops). Compile-time, driver-side, once per
    * declaration — hence its own larger fuel budget.
    */
  def collectEmits(fns: Map[String, VFn], fn: VFn, args: Seq[Any],
      fuelSteps: Long = 2000000000L): Seq[(String, Seq[(String, Any)])] = {
    if (fn.params.size != args.size) throw InterpError(
      s"fn ${fn.name}: expected ${fn.params.size} args, got ${args.size}")
    val env = scala.collection.mutable.Map[String, Any](
      fn.params.map(_._1).zip(args): _*)
    val out = scala.collection.mutable.Buffer.empty[(String, Seq[(String, Any)])]
    try exec(fn.stmts, env, fns, new Fuel(fuelSteps), depth = 0, out)
    catch { case ReturnEx(_) => () }
    out.toSeq
  }

  private def callFn(fns: Map[String, VFn], fn: VFn, args: Seq[Any],
      fuel: Fuel, depth: Int): Any = {
    if (depth > 256) throw InterpError(
      s"fn ${fn.name}: recursion deeper than 256")
    if (fn.params.size != args.size) throw InterpError(
      s"fn ${fn.name}: expected ${fn.params.size} args, got ${args.size}")
    val env = scala.collection.mutable.Map[String, Any](
      fn.params.map(_._1).zip(args): _*)
    val stmts =
      if (fn.stmts.nonEmpty) fn.stmts
      else Seq(SReturn(fn.body)) // expression fns interpret too
    try { exec(stmts, env, fns, fuel, depth); null }
    catch { case ReturnEx(v) => v }
  }

  private def exec(stmts: Seq[VStmt],
      env: scala.collection.mutable.Map[String, Any],
      fns: Map[String, VFn], fuel: Fuel, depth: Int,
      emits: scala.collection.mutable.Buffer[(String, Seq[(String, Any)])] = null): Unit =
    stmts.foreach { st =>
      fuel.tick()
      st match {
        case SLet(n, e)    => env(n) = eval(e, env, fns, fuel, depth)
        case SAssign(n, e) =>
          if (!env.contains(n)) throw InterpError(s"assignment to undeclared '$n'")
          env(n) = eval(e, env, fns, fuel, depth)
        case SReturn(e)    => throw ReturnEx(eval(e, env, fns, fuel, depth))
        case SBreak        => throw BreakEx
        case SContinue     => throw ContinueEx
        case SIf(c, t, e2) =>
          if (truthy(eval(c, env, fns, fuel, depth)))
            exec(t, env, fns, fuel, depth, emits)
          else exec(e2, env, fns, fuel, depth, emits)
        case SWhile(c, body) =>
          try while (truthy(eval(c, env, fns, fuel, depth))) {
            fuel.tick()
            try exec(body, env, fns, fuel, depth, emits)
            catch { case ContinueEx => () }
          } catch { case BreakEx => () }
        case SFor(v, from, to, incl, body) =>
          val a = asLong(eval(from, env, fns, fuel, depth))
          val b = asLong(eval(to, env, fns, fuel, depth))
          val end = if (incl) b else b - 1
          try {
            var i = a
            while (i <= end) {
              fuel.tick()
              env(v) = i
              try exec(body, env, fns, fuel, depth, emits)
              catch { case ContinueEx => () }
              i += 1
            }
          } catch { case BreakEx => () }
        case SEmitStmt(t, eargs) =>
          if (emits == null) throw InterpError(
            s"emit $t: emit-bodied fns run through .process(), not in " +
              "expression position")
          emits += (t -> eargs.map { case (n, e) =>
            n -> eval(e, env, fns, fuel, depth) })
      }
    }

  private def truthy(v: Any): Boolean = v match {
    case b: Boolean => b
    case null       => false
    case other      => throw InterpError(s"non-boolean condition $other")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long   => l
    case d: Double if d == d.floor => d.toLong
    case other     => throw InterpError(s"expected an integer, got $other")
  }

  private def asDouble(v: Any): Double = v match {
    case l: Long   => l.toDouble
    case d: Double => d
    case other     => throw InterpError(s"expected a number, got $other")
  }

  private def num2(op: String, l: Any, r: Any): Any = (l, r) match {
    case (a: Long, b: Long) => op match {
      case "+" => a + b; case "-" => a - b; case "*" => a * b
      case "/" =>
        if (b == 0) throw InterpError("division by zero") else a / b
      case "%" =>
        if (b == 0) throw InterpError("modulo by zero") else a % b
      case "**" => math.pow(a.toDouble, b.toDouble)
      case o    => throw InterpError(s"op '$o' on ints")
    }
    case _ =>
      val (a, b) = (asDouble(l), asDouble(r))
      op match {
        case "+" => a + b; case "-" => a - b; case "*" => a * b
        case "/" => a / b; case "%" => a % b
        case "**" => math.pow(a, b)
        case o   => throw InterpError(s"op '$o' on floats")
      }
  }

  private def cmp(l: Any, r: Any): Int = (l, r) match {
    case (a: Long, b: Long)     => java.lang.Long.compare(a, b)
    case (a: String, b: String) => a.compareTo(b)
    case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
    case _ => java.lang.Double.compare(asDouble(l), asDouble(r))
  }

  private def eval(e: VExpr,
      env: scala.collection.mutable.Map[String, Any],
      fns: Map[String, VFn], fuel: Fuel, depth: Int): Any = {
    fuel.tick()
    def ev(x: VExpr): Any = eval(x, env, fns, fuel, depth)
    e match {
      case VInt(v)  => v
      case VNum(v)  => v
      case VStr(s)  => s
      case VBool(b) => b
      case VNull    => null
      case VRef(n) =>
        env.getOrElse(n, throw InterpError(s"unbound name '$n'"))
      case VUn("-", x) => ev(x) match {
        case l: Long   => -l
        case d: Double => -d
        case o         => throw InterpError(s"unary - on $o")
      }
      case VUn(("!" | "not"), x) => !truthy(ev(x))
      case VBin("and", l, r) => truthy(ev(l)) && truthy(ev(r))
      case VBin("or", l, r)  => truthy(ev(l)) || truthy(ev(r))
      case VBin("==", l, r)  => ev(l) == ev(r)
      case VBin("!=", l, r)  => ev(l) != ev(r)
      case VBin("<", l, r)   => cmp(ev(l), ev(r)) < 0
      case VBin("<=", l, r)  => cmp(ev(l), ev(r)) <= 0
      case VBin(">", l, r)   => cmp(ev(l), ev(r)) > 0
      case VBin(">=", l, r)  => cmp(ev(l), ev(r)) >= 0
      case VBin("+", l, r) => (ev(l), ev(r)) match {
        case (a: String, b) => a + stringOf(b)
        case (a, b: String) => stringOf(a) + b
        case (a: Seq[_], b: Seq[_]) => a ++ b
        case (a, b)         => num2("+", a, b)
      }
      case VBin(op, l, r) => num2(op, ev(l), ev(r))
      case VIf(c, t, f)   => if (truthy(ev(c))) ev(t) else ev(f)
      case VList(items)   => items.map(ev)
      case VStruct(items) => items.map { case (k, v) => k -> ev(v) }.toMap
      case VMethod(t, "__index", Seq(i)) => (ev(t), ev(i)) match {
        case (m: Map[_, _], k) =>
          m.asInstanceOf[Map[Any, Any]].getOrElse(k,
            throw InterpError(s"map has no key $k"))
        case (xs: Seq[_], k: Long) =>
          if (k < 0 || k >= xs.length)
            throw InterpError(s"index $k out of range (${xs.length})")
          xs(k.toInt)
        case (o, k) => throw InterpError(s"cannot index $o with $k")
      }
      case VMethod(t, "__slice", Seq(a, b)) => ev(t) match {
        case xs: Seq[_] =>
          val from = if (a == VNull) 0 else asLong(ev(a)).toInt
          val until = if (b == VNull) xs.length else asLong(ev(b)).toInt
          xs.slice(from, until)
        case s: String =>
          val from = if (a == VNull) 0 else asLong(ev(a)).toInt
          val until = if (b == VNull) s.length else asLong(ev(b)).toInt
          s.substring(math.max(0, from), math.min(s.length, until))
        case o => throw InterpError(s"cannot slice $o")
      }
      case VMethod(t, m, args) => builtin(m, ev(t) +: args.map(ev))
      case VCall(name, args) if fns.contains(name) =>
        callFn(fns, fns(name), args.map(ev), fuel, depth + 1)
      case VCall("__range", Seq(a, b, VBool(incl))) =>
        val from = asLong(ev(a)); val to = asLong(ev(b))
        val end = if (incl) to else to - 1
        if (end - from >= 10000000L) throw InterpError("range too large")
        (from to end).toSeq
      case VCall(name, args) => builtin(name, args.map(ev))
      case other => throw InterpError(
        s"expression $other is outside the interpreted subset")
    }
  }

  private def stringOf(v: Any): String = v match {
    case null      => "null"
    case d: Double => d.toString
    case other     => other.toString
  }

  /** The reference's built-in vocabulary used by imperative bodies
    * (docs/language/builtins.md; imperative_benchmark.rs exercises
    * range/sum/sort/first/contains/len/keys, math, trig and string
    * fns).
    */
  private def builtin(name: String, args: Seq[Any]): Any =
    (name, args) match {
      case ("range", Seq(n: Long)) =>
        if (n > 10000000L) throw InterpError("range too large")
        (0L until n).toSeq
      case ("range", Seq(a: Long, b: Long)) => (a until b).toSeq
      case ("sum", Seq(xs: Seq[_])) =>
        // the reference's sum() returns float (array_sum -> float)
        xs.foldLeft(0.0)((acc, x) => acc + asDouble(x))
      case ("len", Seq(xs: Seq[_]))    => xs.length.toLong
      case ("len", Seq(s: String))     => s.length.toLong
      case ("len", Seq(m: Map[_, _]))  => m.size.toLong
      case ("first", Seq(xs: Seq[_])) =>
        if (xs.isEmpty) null else xs.head
      case ("last", Seq(xs: Seq[_])) =>
        if (xs.isEmpty) null else xs.last
      case ("sort", Seq(xs: Seq[_])) =>
        if (xs.forall(_.isInstanceOf[Long]))
          xs.asInstanceOf[Seq[Long]].sorted
        else if (xs.forall(_.isInstanceOf[String]))
          xs.asInstanceOf[Seq[String]].sorted
        else xs.sortBy(asDouble)
      case ("reverse", Seq(xs: Seq[_])) => xs.reverse
      case ("contains", Seq(xs: Seq[_], x)) => xs.exists(v =>
        v == x || (cmpable(v) && cmpable(x) && cmp(v, x) == 0))
      case ("contains", Seq(s: String, sub: String)) => s.contains(sub)
      case ("keys", Seq(m: Map[_, _]))   => m.keys.toSeq.map(_.toString).sorted
      case ("values", Seq(m: Map[_, _])) =>
        m.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1).map(_._2)
      case ("min", Seq(xs: Seq[_])) => xs.minBy(asDouble)
      case ("max", Seq(xs: Seq[_])) => xs.maxBy(asDouble)
      case ("min", Seq(a, b)) => if (cmp(a, b) <= 0) a else b
      case ("max", Seq(a, b)) => if (cmp(a, b) >= 0) a else b
      case ("abs", Seq(l: Long))   => math.abs(l)
      case ("abs", Seq(d: Double)) => math.abs(d)
      case ("sqrt", Seq(x))  => math.sqrt(asDouble(x))
      case ("floor", Seq(x)) => math.floor(asDouble(x)).toLong
      case ("ceil", Seq(x))  => math.ceil(asDouble(x)).toLong
      case ("round", Seq(x)) => math.round(asDouble(x))
      case ("pow", Seq(a, b)) => math.pow(asDouble(a), asDouble(b))
      case ("exp", Seq(x)) => StrictMath.exp(asDouble(x))
      case ("ln", Seq(x))  => StrictMath.log(asDouble(x))
      case ("log", Seq(x)) => StrictMath.log10(asDouble(x))
      case ("sin", Seq(x)) => StrictMath.sin(asDouble(x))
      case ("cos", Seq(x)) => StrictMath.cos(asDouble(x))
      case ("tan", Seq(x)) => StrictMath.tan(asDouble(x))
      case ("to_float", Seq(x)) => asDouble(x)
      case ("to_int", Seq(l: Long))   => l
      case ("to_int", Seq(d: Double)) => d.toLong
      case ("to_int", Seq(s: String)) => s.trim.toLong
      case ("to_string", Seq(x)) => stringOf(x)
      case ("trim", Seq(s: String))  => s.trim
      case ("lower", Seq(s: String)) => s.toLowerCase
      case ("upper", Seq(s: String)) => s.toUpperCase
      case ("split", Seq(s: String, sep: String)) =>
        s.split(java.util.regex.Pattern.quote(sep), -1).toSeq
      case ("join", Seq(xs: Seq[_], sep: String)) =>
        xs.map(stringOf).mkString(sep)
      case ("starts_with", Seq(s: String, p: String)) => s.startsWith(p)
      case ("ends_with", Seq(s: String, p: String))   => s.endsWith(p)
      case ("replace", Seq(s: String, a: String, b: String)) =>
        s.replace(a, b)
      case (n, as) => throw InterpError(
        s"builtin $n(${as.mkString(", ")}) is outside the interpreted subset")
    }

  private def cmpable(v: Any): Boolean =
    v.isInstanceOf[Long] || v.isInstanceOf[Double]
}
