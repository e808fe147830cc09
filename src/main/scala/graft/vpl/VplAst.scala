package graft.vpl

/** AST for the VPL subset this library compiles to Spark plans.
  *
  * The shape follows the reference grammar
  * (crates/varpulis-parser/src/varpulis.pest, docs/language/grammar.md):
  * a program is a list of declarations; a stream declaration is a
  * source plus an operator chain; expressions are conventional
  * precedence-climbing binaries over literals / field refs / calls.
  */
object VplAst {

  // --- expressions -------------------------------------------------
  sealed trait VExpr
  final case class VInt(v: Long) extends VExpr
  final case class VNum(v: Double) extends VExpr
  final case class VStr(v: String) extends VExpr
  final case class VBool(v: Boolean) extends VExpr
  case object VNull extends VExpr
  /** duration literal, canonicalized to microseconds (grammar: duration) */
  final case class VDur(us: Long) extends VExpr
  /** bare identifier — a field of the current event (or a let-bound
    * constant, resolved at compile time)
    */
  final case class VRef(name: String) extends VExpr
  /** `alias.field` — a field of a previously bound sequence step */
  final case class VField(qual: String, field: String) extends VExpr
  final case class VUn(op: String, e: VExpr) extends VExpr
  final case class VBin(op: String, l: VExpr, r: VExpr) extends VExpr
  final case class VCall(fn: String, args: Seq[VExpr]) extends VExpr
  /** `obj.method(args)` — e.g. the pattern-lambda `events.len()` */
  final case class VMethod(target: VExpr, method: String, args: Seq[VExpr]) extends VExpr
  final case class VList(items: Seq[VExpr]) extends VExpr
  /** `{name: expr, ...}` struct literal (emit nested payloads) */
  final case class VStruct(items: Seq[(String, VExpr)]) extends VExpr
  /** `if c then a else b` ternary */
  final case class VIf(cond: VExpr, t: VExpr, f: VExpr) extends VExpr
  /** `x => body` / `(a, b) => body` lambda (grammar: lambda_expr) */
  final case class VLambda(params: Seq[String], body: VExpr) extends VExpr

  // --- stream pipeline ---------------------------------------------
  /** one `-> [all] Type [where expr] [as alias]` transition (or the
    * aliased head of a sequence)
    */
  final case class SeqStep(
      eventType: String,
      alias: Option[String],
      where: Option[VExpr],
      matchAll: Boolean)

  sealed trait VOp
  final case class OpFrom(connector: String, params: Seq[(String, VExpr)]) extends VOp
  final case class OpWhere(e: VExpr) extends VOp
  final case class OpHaving(e: VExpr) extends VOp
  /** select items: `name` (passthrough) or `name: expr` (computed) */
  final case class OpSelect(items: Seq[(String, Option[VExpr])]) extends VOp
  final case class OpWindow(positional: Seq[VExpr], named: Seq[(String, VExpr)]) extends VOp
  final case class OpAggregate(aggs: Seq[(String, VExpr)]) extends VOp
  final case class OpPartitionBy(cols: Seq[String]) extends VOp
  final case class OpOrderBy(items: Seq[(VExpr, Boolean)]) extends VOp
  final case class OpLimit(n: Long) extends VOp
  final case class OpDistinct(cols: Seq[String]) extends VOp
  final case class OpEmit(args: Seq[(String, VExpr)], asType: Option[String] = None) extends VOp
  final case class OpTo(connector: String, params: Seq[(String, VExpr)]) extends VOp
  final case class OpWithin(d: VExpr) extends VOp
  final case class OpFollowedBy(step: SeqStep) extends VOp
  final case class OpNot(step: SeqStep) extends VOp
  final case class OpEnrich(connector: String, params: Seq[(String, VExpr)]) extends VOp
  /** `.on(cond)` — join condition for a [[SrcJoin]] source */
  final case class OpOn(cond: VExpr) extends VOp
  /** `.process(fn(args))` — per-event generation from a statement fn */
  final case class OpProcess(call: VExpr) extends VOp
  final case class OpContext(name: String) extends VOp
  final case class OpForecast(params: Seq[(String, VExpr)]) extends VOp
  /** `.pattern(name: events => expr)` — windowed match lambda */
  final case class OpPattern(name: String, body: VExpr) extends VOp
  final case class OpWatermark(params: Seq[(String, VExpr)]) extends VOp
  final case class OpAllowedLateness(d: VExpr) extends VOp
  /** `.print(...)` / `.log(...)` / `.tap(...)` — side-effect taps,
    * no-ops in the batch realization
    */
  final case class OpTapLike(kind: String, args: Seq[VExpr]) extends VOp
  final case class OpScore(params: Seq[(String, VExpr)]) extends VOp

  sealed trait VSource
  /** head of the pipeline: an event type or a previously declared
    * stream, optionally aliased (sequence head)
    */
  final case class SrcName(name: String, alias: Option[String]) extends VSource
  final case class SrcMerge(names: Seq[String]) extends VSource
  /** `join(S1, S2, ...)` — stream-stream join, condition from `.on` */
  final case class SrcJoin(names: Seq[String]) extends VSource
  /** `timer(period[, initial_delay: d])` — periodic tick source
    * (benchmarks/apama-comparison 10_timer_source.vpl)
    */
  final case class SrcTimer(periodUs: Long, delayUs: Long) extends VSource

  final case class VStream(name: String, source: VSource, ops: Seq[VOp])

  // --- declarations ------------------------------------------------
  final case class VEvent(name: String, parent: Option[String],
      fields: Seq[(String, String)])
  final case class VConnector(name: String, ctype: String,
      params: Seq[(String, VExpr)])
  final case class VLet(name: String, value: VExpr)
  final case class VContext(name: String, cores: Seq[Int])
  // --- imperative fn bodies (the `.process()` subset) --------------
  sealed trait VStmt
  /** `for v in a..b:` (exclusive) / `a..=b` (inclusive) / `range(n)` */
  final case class SFor(v: String, from: VExpr, to: VExpr,
      inclusive: Boolean, body: Seq[VStmt]) extends VStmt
  /** `emit Type(name: expr, ...)` inside a processed fn */
  final case class SEmitStmt(eventType: String,
      args: Seq[(String, VExpr)]) extends VStmt
  /** `let x [: type] = expr` binding */
  final case class SLet(name: String, value: VExpr) extends VStmt
  /** `x := expr` reassignment */
  final case class SAssign(name: String, value: VExpr) extends VStmt
  /** `while cond:` loop */
  final case class SWhile(cond: VExpr, body: Seq[VStmt]) extends VStmt
  /** statement `if cond:` / `else:` (distinct from the ternary) */
  final case class SIf(cond: VExpr, thn: Seq[VStmt],
      els: Seq[VStmt]) extends VStmt
  /** `return [expr]` (a bare trailing expression is an implicit one) */
  final case class SReturn(e: VExpr) extends VStmt
  case object SBreak extends VStmt
  case object SContinue extends VStmt

  /** function: single-expression body (inlined at call sites), or a
    * statement block of for/emit (compile-time unrolled by
    * `.process()`)
    */
  final case class VFn(name: String, params: Seq[(String, String)],
      ret: Option[String], body: VExpr, stmts: Seq[VStmt] = Nil)

  /** SASE+ reusable pattern declaration:
    * `pattern Name = SEQ(A, B+ where p as b, NOT C) within 10m partition by k`
    * with OR / AND / NOT combinators between pattern expressions
    * (grammar: sase_pattern_expr).
    */
  final case class SaseItem(eventType: String, kleene: Option[String],
      where: Option[VExpr], alias: Option[String], negated: Boolean)
  sealed trait SaseExpr
  final case class SaseSeq(items: Seq[SaseItem]) extends SaseExpr
  final case class SaseRef(item: SaseItem) extends SaseExpr
  final case class SaseOr(l: SaseExpr, r: SaseExpr) extends SaseExpr
  final case class SaseAnd(l: SaseExpr, r: SaseExpr) extends SaseExpr
  final case class SaseNeg(e: SaseExpr) extends SaseExpr
  final case class VPatternDecl(name: String, expr: SaseExpr,
      withinUs: Option[Long], partitionBy: Option[String])

  final case class VProgram(
      events: Seq[VEvent],
      connectors: Seq[VConnector],
      lets: Seq[VLet],
      contexts: Seq[VContext],
      fns: Seq[VFn],
      patterns: Seq[VPatternDecl],
      streams: Seq[VStream])
}
