package graft.vpl

import VplAst._

/** Interprets a VPL predicate against NFA run payloads — the
  * cross-step predicate backend of the STREAMING sequence path.
  *
  * The batch compiler evaluates cross-step predicates as Catalyst
  * join conditions; the streaming NFA evaluates them per
  * run-advancement inside `flatMapGroupsWithState`
  * ([[graft.streaming.PatternStream.detectGeneric]]), against the
  * string-keyed payload maps the runs carry (reference: sase.rs run
  * advancement evaluates per-edge predicates on the live run's bound
  * events). Values are parsed by the step's declared field types;
  * a missing field or failed parse makes the conjunct FALSE (the
  * reference's dynamically-typed lookups return no-match on absent
  * payload fields).
  *
  * Everything here is plain serializable data (the VExpr tree, type
  * maps) — the closures ship to executors inside the stateful
  * operator.
  */
object PayloadEval extends Serializable {

  /** `ts` resolves to the reserved `__ts_us` micros entry. */
  private final val TsKey = "__ts_us"

  private def parse(ty: String, v: String): Option[Any] = ty match {
    case "int"   => v.toLongOption
    case "float" => v.toDoubleOption
    case "bool"  => v.toBooleanOption
    case _       => Some(v)
  }

  /** Evaluate expression `e` to Option[Any] (None = null/missing).
    *  - `own`: the incoming event's payload + its field types
    *  - `prior(j)`: payload of step j's matched element (for a Kleene
    *    step, the LAST element — sase.rs "previous" semantics) with
    *    `stepTypes(j)` its field types.
    */
  private def eval(
      e: VExpr,
      own: Map[String, String], ownTypes: Map[String, String],
      prior: IndexedSeq[Map[String, String]],
      aliasIdx: Map[String, Int],
      stepTypes: IndexedSeq[Map[String, String]]): Option[Any] = {
    def ev(x: VExpr): Option[Any] =
      eval(x, own, ownTypes, prior, aliasIdx, stepTypes)
    def num(a: Any): Option[Double] = a match {
      case l: Long => Some(l.toDouble); case d: Double => Some(d)
      case _ => None
    }
    e match {
      case VInt(v)  => Some(v)
      case VNum(v)  => Some(v)
      case VStr(v)  => Some(v)
      case VBool(v) => Some(v)
      case VDur(us) => Some(us)
      case VNull    => None
      case VRef(f) =>
        if (f == "ts") own.get(TsKey).flatMap(_.toLongOption)
        else own.get(f).flatMap(v => parse(ownTypes.getOrElse(f, "str"), v))
      case VField(q, f) =>
        aliasIdx.get(q).flatMap { j =>
          prior.lift(j).flatMap { pay =>
            if (f == "ts") pay.get(TsKey).flatMap(_.toLongOption)
            else pay.get(f).flatMap(v =>
              parse(stepTypes.lift(j).flatMap(_.get(f)).getOrElse("str"), v))
          }
        }
      case VUn("not", x) => ev(x).collect { case b: Boolean => !b }
      case VUn("-", x)   => ev(x).flatMap(num).map(d => -d)
      case VBin("and", l, r) =>
        // three-valued AND collapses to false on null (predicate use)
        Some(ev(l).contains(true) && ev(r).contains(true))
      case VBin("or", l, r) =>
        Some(ev(l).contains(true) || ev(r).contains(true))
      case VBin(op, l, r) =>
        for {
          lv <- ev(l); rv <- ev(r)
          res <- (op, lv, rv) match {
            case ("==", a: String, b: String) => Some(a == b)
            case ("!=", a: String, b: String) => Some(a != b)
            case ("==", a: Boolean, b: Boolean) => Some(a == b)
            case ("!=", a: Boolean, b: Boolean) => Some(a != b)
            case (_, a, b) =>
              for { x <- num(a); y <- num(b) } yield op match {
                case "==" => x == y
                case "!=" => x != y
                case "<"  => x < y
                case "<=" => x <= y
                case ">"  => x > y
                case ">=" => x >= y
                case "+"  => x + y
                case "-"  => x - y
                case "*"  => x * y
                case "/"  => x / y
                case other =>
                  throw new IllegalArgumentException(
                    s"payload predicate: unsupported operator $other")
              }
          }
        } yield res
      case VCall("abs", Seq(x)) => ev(x).flatMap(num).map(math.abs)
      case VIf(c, t, f) =>
        if (ev(c).contains(true)) ev(t) else ev(f)
      case other =>
        throw new IllegalArgumentException(
          s"payload predicate: unsupported expression $other " +
            "(needs the batch compiler)")
    }
  }

  /** Compile conjuncts into one serializable predicate; fails fast at
    * COMPILE time on unsupported shapes by probing with empty
    * payloads (so the error surfaces as a VplCompileError, not an
    * executor-side crash mid-stream).
    */
  def predicate(
      conjs: Seq[VExpr],
      ownTypes: Map[String, String],
      aliasIdx: Map[String, Int],
      stepTypes: IndexedSeq[Map[String, String]]):
      (Map[String, String], IndexedSeq[Map[String, String]]) => Boolean = {
    // probe: walks the tree once; throws on unsupported node kinds
    conjs.foreach(c =>
      eval(c, Map.empty, ownTypes, IndexedSeq.empty, aliasIdx, stepTypes))
    (own, prior) =>
      conjs.forall(c =>
        eval(c, own, ownTypes, prior, aliasIdx, stepTypes).contains(true))
  }
}
