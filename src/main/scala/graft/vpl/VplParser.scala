package graft.vpl

import VplAst._

/** Hand-written tokenizer + recursive-descent parser for the VPL
  * subset compiled by [[VplCompiler]].
  *
  * Grammar followed: crates/varpulis-parser/src/varpulis.pest (PEG) and
  * docs/language/grammar.md in the reference. Differences from the
  * reference parser are deliberate simplifications, not semantics
  * changes:
  *
  *  - The reference preprocesses indentation into INDENT/DEDENT tokens
  *    for `event`/`config`/`fn` blocks. Here those blocks end at the
  *    next statement keyword instead — equivalent on every reference
  *    example/scenario file (field names never collide with statement
  *    keywords).
  *  - `fn` bodies are single expressions (all reference scenario fns
  *    are); statement-block bodies are rejected with a clear error.
  *  - Inside a `->` step's `where` filter, `.ident(` terminates the
  *    expression (it starts the next stream op) exactly as the
  *    reference's `filter_postfix_suffix` rule (`!("(")`) does.
  */
object VplParser {

  // ---------------------------------------------------------------- tokens
  sealed trait Tok { def pos: Int }
  final case class TId(s: String, pos: Int) extends Tok
  final case class TInt(v: Long, pos: Int) extends Tok
  final case class TFloat(v: Double, pos: Int) extends Tok
  final case class TStr(s: String, pos: Int) extends Tok
  final case class TDur(us: Long, pos: Int) extends Tok
  final case class TOp(s: String, pos: Int) extends Tok
  final case class TEof(pos: Int) extends Tok

  final case class VplParseError(msg: String, line: Int)
      extends RuntimeException(s"VPL parse error at line $line: $msg")

  private val multiOps = Seq("..=", "->", "=>", "==", "!=", "<=", ">=",
    "??", "?.", "..", "**", "<<", ">>", ":=")
  private val singleOps = ".,:()[]{}+-*/%<>=?|^&~@!".toSet

  private val durUnits = Seq("ns" -> 1L, "us" -> 1L, "ms" -> 1000L,
    "s" -> 1000000L, "m" -> 60000000L, "h" -> 3600000000L,
    "d" -> 86400000000L)

  def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    def isIdStart(c: Char) = c.isLetter || c == '_'
    def isIdChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = src(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
      else if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
      else if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(src(i) == '*' && src(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
      } else if (c == '"') {
        val start = i; i += 1
        val sb = new StringBuilder
        while (i < n && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < n) { sb.append(src(i + 1)); i += 2 }
          else { sb.append(src(i)); i += 1 }
        }
        if (i >= n) throw VplParseError("unterminated string", line(src, start))
        i += 1
        out += TStr(sb.toString, start)
      } else if (c.isDigit) {
        val start = i
        while (i < n && src(i).isDigit) i += 1
        if (i < n && src(i) == '.' && i + 1 < n && src(i + 1).isDigit) {
          i += 1
          while (i < n && src(i).isDigit) i += 1
          if (i < n && (src(i) == 'e' || src(i) == 'E')) {
            i += 1
            if (i < n && (src(i) == '+' || src(i) == '-')) i += 1
            while (i < n && src(i).isDigit) i += 1
          }
          out += TFloat(src.substring(start, i).toDouble, start)
        } else {
          val numEnd = i
          // duration suffix must be a complete word: 5s yes, 5sec no
          val suffix = durUnits.sortBy(-_._1.length).find { case (u, _) =>
            src.regionMatches(i, u, 0, u.length) &&
              (i + u.length >= n || !isIdChar(src(i + u.length)))
          }
          suffix match {
            case Some((u, mult)) =>
              i += u.length
              out += TDur(src.substring(start, numEnd).toLong * mult, start)
            case None =>
              out += TInt(src.substring(start, numEnd).toLong, start)
          }
        }
      } else if (isIdStart(c)) {
        val start = i
        while (i < n && isIdChar(src(i))) i += 1
        out += TId(src.substring(start, i), start)
      } else {
        val start = i
        multiOps.find(op => src.regionMatches(i, op, 0, op.length)) match {
          case Some(op) => i += op.length; out += TOp(op, start)
          case None =>
            if (singleOps(c)) { i += 1; out += TOp(c.toString, start) }
            else throw VplParseError(s"unexpected character '$c'", line(src, i))
        }
      }
    }
    out += TEof(n)
    out.result()
  }

  private def line(src: String, pos: Int): Int =
    src.substring(0, math.min(pos, src.length)).count(_ == '\n') + 1

  // ---------------------------------------------------------------- parser
  private val stmtKeywords = Set("stream", "event", "connector", "pattern",
    "fn", "let", "var", "const", "config", "context", "import", "type")

  def parse(src: String): VProgram = {
    val expanded = expandDeclLoops(src)
    new P(tokenize(expanded), expanded).program()
  }

  /** Compile-time expansion of top-level declaration loops (the
    * parser crate's expand pass, reference expand.rs:13): `for VAR in
    * A..B:` / `A..=B:` at indent 0 with LITERAL integer bounds
    * repeats its body — dedented by the first body line's indent —
    * once per value, textually substituting `{VAR}`. Runs in passes
    * so a nested loop (dedented to indent 0 by its parent) expands on
    * the next pass; the mandelbrot demos declare 16 contexts/streams
    * this way (`context t{row}{col}`). Non-literal bounds never
    * match, so fn-body `for` statements pass through untouched.
    */
  private[vpl] def expandDeclLoops(src: String): String = {
    val maxIterations = 10000
    val maxPasses = 10
    val ForLine =
      """for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+(-?\d+)\s*\.\.(=?)\s*(-?\d+)\s*:""".r
    def onePass(s: String): String = {
      val lines = s.split("\n", -1)
      val out = new StringBuilder
      var i = 0
      while (i < lines.length) {
        val line = lines(i)
        val indent = line.length - line.dropWhile(_ == ' ').length
        val trimmed = line.trim
        val m = if (indent == 0) ForLine.pattern.matcher(trimmed) else null
        if (m != null && m.matches()) {
          val v = m.group(1)
          val from = m.group(2).toLong
          val to = m.group(4).toLong + (if (m.group(3) == "=") 1 else 0)
          if (to - from > maxIterations)
            throw VplParseError(
              s"declaration for-loop range too large: ${to - from} " +
                s"iterations (max $maxIterations)", i + 1)
          // body: following lines until the next nonempty indent-0 line
          val bodyStart = i + 1
          var bodyEnd = bodyStart
          var bodyIndent = -1
          var scan = true
          while (scan && bodyEnd < lines.length) {
            val bl = lines(bodyEnd)
            if (bl.trim.isEmpty) bodyEnd += 1
            else {
              val bi = bl.length - bl.dropWhile(_ == ' ').length
              if (bi == 0) scan = false
              else {
                if (bodyIndent < 0) bodyIndent = bi
                bodyEnd += 1
              }
            }
          }
          val strip = if (bodyIndent < 0) 4 else bodyIndent
          var value = from
          while (value < to) {
            var j = bodyStart
            while (j < bodyEnd) {
              val bl = lines(j)
              if (bl.trim.isEmpty) out.append('\n')
              else {
                // dedent by at most the line's OWN indent: a ragged
                // body line indented less than the first body line
                // must never lose non-whitespace content to the slice
                val bi = bl.length - bl.dropWhile(_ == ' ').length
                val ded = bl.substring(math.min(strip, bi))
                out.append(ded.replace(s"{$v}", value.toString)).append('\n')
              }
              j += 1
            }
            value += 1
          }
          i = bodyEnd
        } else {
          out.append(line).append('\n')
          i += 1
        }
      }
      out.toString.stripSuffix("\n")
    }
    var cur = src
    var pass = 0
    while (pass < maxPasses) {
      val next = onePass(cur)
      if (next == cur) return cur
      cur = next
      pass += 1
    }
    throw VplParseError(
      s"declaration for-loop expansion exceeded $maxPasses passes", 1)
  }

  private final class P(toks: Vector[Tok], src: String) {
    private var pos = 0
    // `type Alias = <type>` bindings (grammar.md type_alias) —
    // resolved structurally at parse time; an alias carries no
    // behavior beyond the underlying type
    private val typeAliases = scala.collection.mutable.Map.empty[String, String]

    private def peek: Tok = toks(pos)
    private def peekAt(k: Int): Tok = toks(math.min(pos + k, toks.length - 1))
    private def advance(): Tok = { val t = toks(pos); pos += 1; t }
    private def fail(msg: String): Nothing =
      throw VplParseError(s"$msg (found ${show(peek)})", line(src, peek.pos))
    private def show(t: Tok): String = t match {
      case TId(s, _)    => s"identifier '$s'"
      case TInt(v, _)   => s"int $v"
      case TFloat(v, _) => s"float $v"
      case TStr(s, _)   => s""""$s""""
      case TDur(v, _)   => s"duration ${v}us"
      case TOp(s, _)    => s"'$s'"
      case TEof(_)      => "end of input"
    }

    private def isOp(s: String): Boolean = peek match {
      case TOp(o, _) => o == s
      case _         => false
    }
    private def isId(s: String): Boolean = peek match {
      case TId(o, _) => o == s
      case _         => false
    }
    private def eatOp(s: String): Unit =
      if (isOp(s)) { pos += 1 } else fail(s"expected '$s'")
    private def eatId(s: String): Unit =
      if (isId(s)) { pos += 1 } else fail(s"expected '$s'")
    private def ident(): String = peek match {
      case TId(s, _) => pos += 1; s
      case _         => fail("expected identifier")
    }

    // ------------------------------------------------------------ program
    def program(): VProgram = {
      val events = Seq.newBuilder[VEvent]
      val connectors = Seq.newBuilder[VConnector]
      val lets = Seq.newBuilder[VLet]
      val contexts = Seq.newBuilder[VContext]
      val fns = Seq.newBuilder[VFn]
      val patterns = Seq.newBuilder[VPatternDecl]
      val streams = Seq.newBuilder[VStream]
      while (!peek.isInstanceOf[TEof]) peek match {
        case TId("event", _)     => events += eventDecl()
        case TId("connector", _) => connectors += connectorDecl()
        case TId("stream", _)    => streams += streamDecl()
        case TId("fn", _)        => fns += fnDecl()
        case TId("pattern", _)   => patterns += patternDecl()
        case TId("let", _) | TId("var", _) | TId("const", _) =>
          advance(); val n = ident()
          if (isOp(":")) { eatOp(":"); typeExpr() }
          eatOp("="); lets += VLet(n, expr())
        // top-level reassignment of a declared var: `x := expr`
        // (11_variables.vpl). Appended as another binding; the
        // compiler folds bindings in order, so the RHS sees the
        // PREVIOUS value.
        case TId(n, _) if peekAt(1) == TOp(":=", peekAt(1).pos) =>
          advance(); advance(); lets += VLet(n, expr())
        case TId("config", _)  => configBlock()
        case TId("context", _) => contexts += contextDecl()
        case TId("type", _) =>
          advance(); val n = ident(); eatOp("="); typeAliases(n) = typeExpr()
        case TId("import", _) =>
          advance()
          peek match { case TStr(_, _) => advance(); case _ => fail("expected import path string") }
          if (isId("as")) { advance(); ident() }
        case _ => fail("expected a declaration")
      }
      VProgram(events.result(), connectors.result(), lets.result(),
        contexts.result(), fns.result(), patterns.result(), streams.result())
    }

    // ------------------------------------------------------------ decls
    private def eventDecl(): VEvent = {
      eatId("event")
      val name = ident()
      val parent = if (isId("extends")) { advance(); Some(ident()) } else None
      eatOp(":")
      val fields = Seq.newBuilder[(String, String)]
      var more = true
      while (more) peek match {
        // `type` is a fine FIELD name (functions.vpl `type: str`) —
        // the `name ':'` lookahead disambiguates from declarations
        case TId(f, _) if (!stmtKeywords(f) || f == "type") &&
            peekAt(1) == TOp(":", peekAt(1).pos) =>
          advance(); eatOp(":")
          val t = typeExpr()
          fields += (f -> t)
        case _ => more = false
      }
      val fs = fields.result()
      if (fs.isEmpty) fail(s"event $name: expected at least one field")
      VEvent(name, parent, fs)
    }

    private def typeExpr(): String = peek match {
      case TOp("[", _) => advance(); val t = typeExpr(); eatOp("]"); opt(s"[$t]")
      case TOp("{", _) =>
        advance(); val k = typeExpr(); eatOp(":"); val v = typeExpr(); eatOp("}")
        opt(s"{$k:$v}")
      case TOp("(", _) =>
        advance()
        val parts = Seq.newBuilder[String]
        parts += typeExpr()
        while (isOp(",")) { advance(); parts += typeExpr() }
        eatOp(")")
        opt(parts.result().mkString("(", ",", ")"))
      case TId("Stream", _) =>
        advance(); eatOp("<"); val t = typeExpr(); eatOp(">"); opt(s"Stream<$t>")
      case TId(t, _) => advance(); opt(typeAliases.getOrElse(t, t))
      case _         => fail("expected a type")
    }
    private def opt(t: String): String =
      if (isOp("?")) { advance(); s"$t?" } else t

    private def connectorDecl(): VConnector = {
      eatId("connector")
      val name = ident()
      eatOp("=")
      val ctype = ident()
      eatOp("(")
      val params = if (isOp(")")) Nil else namedArgList()
      eatOp(")")
      VConnector(name, ctype, params)
    }

    private def contextDecl(): VContext = {
      eatId("context")
      val name = ident()
      var cores = Seq.empty[Int]
      if (isOp("(")) {
        advance(); eatId("cores"); eatOp(":"); eatOp("[")
        val b = Seq.newBuilder[Int]
        b += intLit().toInt
        while (isOp(",")) { advance(); b += intLit().toInt }
        eatOp("]"); eatOp(")")
        cores = b.result()
      }
      VContext(name, cores)
    }

    private def configBlock(): Unit = {
      eatId("config")
      if (isOp(":")) {
        advance()
        var more = true
        while (more) peek match {
          case TId(f, _) if !stmtKeywords(f) && peekAt(1) == TOp(":", peekAt(1).pos) =>
            advance(); eatOp(":"); configValue(); if (isOp(",")) advance()
          case _ => more = false
        }
      } else {
        ident(); eatOp("{")
        while (!isOp("}")) { ident(); eatOp(":"); configValue(); if (isOp(",")) advance() }
        eatOp("}")
      }
    }

    private def configValue(): VExpr = peek match {
      case TOp("[", _) =>
        advance()
        val items = Seq.newBuilder[VExpr]
        if (!isOp("]")) { items += configValue(); while (isOp(",")) { advance(); items += configValue() } }
        eatOp("]")
        VList(items.result())
      case _ => primary(filter = false)
    }

    /** Column (0-based) of a source offset — the layout information
      * the reference's INDENT/DEDENT preprocessing carries; statement
      * blocks in fn bodies are delimited by it.
      */
    private def colOf(p: Int): Int = {
      var i = p - 1
      while (i >= 0 && src(i) != '\n') i -= 1
      p - i - 1
    }

    private def fnDecl(): VFn = {
      val fnCol = colOf(peek.pos)
      eatId("fn")
      val name = ident()
      eatOp("(")
      val params = Seq.newBuilder[(String, String)]
      if (!isOp(")")) {
        def one(): Unit = { val p = ident(); eatOp(":"); params += (p -> typeExpr()) }
        one(); while (isOp(",")) { advance(); one() }
      }
      eatOp(")")
      val ret = if (isOp("->")) { advance(); Some(typeExpr()) } else None
      eatOp(":")
      // EVERY body parses as an indentation-delimited statement block
      // (a bare expression is the implicit return). Shapes then
      // specialize:
      //  - `let*` + return → the substituted single EXPRESSION the
      //    inliner puts into Catalyst (functions.vpl calculate_score,
      //    and one-return fns like `fn double(x): return x * 2`)
      //  - for/emit only → the `.process()` unroll subset
      //  - anything with while/if/assignment/recursion → a statement
      //    fn, evaluated by the compile-time interpreter (VplInterp)
      //    for constant-argument calls
      val stmts = stmtBlockIndent(fnCol)
      if (stmts.isEmpty) fail(s"fn $name: empty body")
      val isProcess = stmts.forall {
        case _: SFor | _: SEmitStmt => true
        case _                      => false
      } && stmts.exists {
        case _: SFor | _: SEmitStmt => true
        case _                      => false
      } && {
        def hasEmit(ss: Seq[VStmt]): Boolean = ss.exists {
          case _: SEmitStmt   => true
          case SFor(_, _, _, _, b) => hasEmit(b)
          case _              => false
        }
        hasEmit(stmts)
      }
      if (isProcess) return VFn(name, params.result(), ret, VNull, stmts)
      // pure value shapes desugar to a single EXPRESSION the inliner
      // puts into Catalyst (so event-field arguments work per row):
      // a trailing return, or an if/elif/else chain whose every
      // branch returns (→ nested ternary)
      def asExpr(ss: Seq[VStmt]): Option[VExpr] = ss match {
        case Seq(SReturn(e))  => Some(e)
        case Seq(SIf(c, t, els)) if els.nonEmpty =>
          for (a <- asExpr(t); b <- asExpr(els)) yield VIf(c, a, b)
        case _ => None
      }
      val letPrefix = stmts.takeWhile(_.isInstanceOf[SLet])
      asExpr(stmts.drop(letPrefix.length)) match {
        case Some(e0) =>
          val body = letPrefix.collect { case SLet(n, r) => (n, r) }
            .foldRight(e0) { case ((n, r), acc) => subst(acc, n, r) }
          VFn(name, params.result(), ret, body)
        case None => VFn(name, params.result(), ret, VNull, stmts)
      }
    }

    /** Indentation-aware statement block: statements sit at one
      * column strictly right of the parent construct; the first
      * dedent ends the block, matching the reference's INDENT/DEDENT
      * layout. A trailing bare expression is the implicit return.
      */
    private def stmtBlockIndent(parentCol: Int): Seq[VStmt] = {
      val stmts = Seq.newBuilder[VStmt]
      if (peek.isInstanceOf[TEof]) fail("expected an indented block")
      val blockCol = colOf(peek.pos)
      if (blockCol <= parentCol) fail("expected an indented block")
      var more = true
      while (more && !peek.isInstanceOf[TEof]) {
        val c = colOf(peek.pos)
        if (c < blockCol) more = false
        else if (c > blockCol) fail("unexpected extra indentation")
        else peek match {
          // `var` = `let` in a statement body: both introduce a
          // binding the `:=` statement may reassign (the reference
          // treats fn-local let/var identically; the mandelbrot fns
          // use `var zr = 0.0` + `zr := ...`)
          case TId("let", _) | TId("var", _) =>
            advance(); val n = ident()
            if (isOp(":")) { advance(); typeExpr() }
            eatOp("=")
            stmts += SLet(n, expr())
          case TId("while", _) =>
            advance(); val cond = expr(); eatOp(":")
            stmts += SWhile(cond, stmtBlockIndent(blockCol))
          case TId("for", _) =>
            advance(); val v = ident(); eatId("in")
            val (from, to, incl) = expr() match {
              case VCall("__range", Seq(a, b, VBool(i))) => (a, b, i)
              case VCall("range", Seq(n))                => (VInt(0), n, false)
              case _ =>
                fail("expected a range (a..b, a..=b or range(n)) in for")
            }
            eatOp(":")
            stmts += SFor(v, from, to, incl, stmtBlockIndent(blockCol))
          case TId("return", _) =>
            advance()
            val dedented = peek.isInstanceOf[TEof] ||
              colOf(peek.pos) <= blockCol
            stmts += SReturn(if (dedented) VNull else expr())
          case TId("break", _)    => advance(); stmts += SBreak
          case TId("continue", _) => advance(); stmts += SContinue
          case TId("emit", _) =>
            advance(); val t = ident()
            eatOp("(")
            val args = Seq.newBuilder[(String, VExpr)]
            def one(): Unit = {
              val n = ident(); eatOp(":"); args += (n -> expr())
            }
            if (!isOp(")")) { one(); while (isOp(",")) { advance(); one() } }
            eatOp(")")
            stmts += SEmitStmt(t, args.result())
          case TId("if", _) =>
            // statement `if cond:` vs the ternary `if c then a else b`
            // as an implicit return — backtrack on `then`
            val save = pos
            advance(); val cond = expr()
            if (isOp(":")) {
              advance()
              val thn = stmtBlockIndent(blockCol)
              def ifTail(): Seq[VStmt] =
                if (isId("elif") && colOf(peek.pos) == blockCol) {
                  advance(); val c2 = expr(); eatOp(":")
                  val t2 = stmtBlockIndent(blockCol)
                  Seq(SIf(c2, t2, ifTail()))
                } else if (isId("else") && colOf(peek.pos) == blockCol) {
                  advance(); eatOp(":"); stmtBlockIndent(blockCol)
                } else Nil
              stmts += SIf(cond, thn, ifTail())
            } else {
              pos = save
              stmts += SReturn(expr())
              more = false
            }
          case TId(n, _) if peekAt(1) == TOp(":=", peekAt(1).pos) =>
            advance(); advance()
            stmts += SAssign(n, expr())
          case _ =>
            stmts += SReturn(expr())
            more = false
        }
      }
      stmts.result()
    }

    private def patternDecl(): VPatternDecl = {
      eatId("pattern")
      val name = ident()
      eatOp("=")
      val items = saseOr()
      val within = if (isId("within")) {
        advance()
        peek match {
          case TDur(us, _) => advance(); Some(us)
          case _           => fail("expected duration after 'within'")
        }
      } else None
      val part = if (isId("partition")) {
        advance(); eatId("by"); Some(ident())
      } else None
      VPatternDecl(name, items, within, part)
    }

    private def saseOr(): SaseExpr = {
      var l = saseAnd()
      while (isId("OR")) { advance(); l = SaseOr(l, saseAnd()) }
      l
    }
    private def saseAnd(): SaseExpr = {
      var l = saseNot()
      while (isId("AND")) { advance(); l = SaseAnd(l, saseNot()) }
      l
    }
    private def saseNot(): SaseExpr =
      // `NOT <ident>` inside SEQ is a negated item; at combinator level
      // `NOT (expr)` negates a sub-pattern
      if (isId("NOT") && peekAt(1) == TOp("(", peekAt(1).pos)) {
        advance(); SaseNeg(sasePrimary())
      } else sasePrimary()

    private def sasePrimary(): SaseExpr =
      if (isId("SEQ")) {
        advance(); eatOp("(")
        val b = Seq.newBuilder[SaseItem]
        b += saseItem()
        while (isOp(",")) { advance(); b += saseItem() }
        eatOp(")")
        SaseSeq(b.result())
      } else if (isOp("(")) {
        advance(); val e = saseOr(); eatOp(")"); e
      } else SaseRef(saseItem())

    private def saseItem(): SaseItem = {
      val negated = if (isId("NOT")) { advance(); true } else false
      val t = ident()
      val kleene = peek match {
        case TOp(k, _) if k == "+" || k == "*" || k == "?" => advance(); Some(k)
        case _                                             => None
      }
      val where = if (isId("where")) { advance(); Some(expr()) } else None
      val alias = if (isId("as")) { advance(); Some(ident()) } else None
      SaseItem(t, kleene, where, alias, negated)
    }

    // ------------------------------------------------------------ streams
    private def streamDecl(): VStream = {
      eatId("stream")
      val name = ident()
      if (isOp(":")) { advance(); typeExpr() }
      eatOp("=")
      val source = streamSource()
      val ops = Seq.newBuilder[VOp]
      var more = true
      while (more) {
        if (isOp(".")) ops += dotOp()
        else if (isOp("->")) ops += followedBy()
        else more = false
      }
      VStream(name, source, ops.result())
    }

    private def streamSource(): VSource =
      if (isId("merge")) {
        advance(); eatOp("(")
        val names = Seq.newBuilder[String]
        names += ident()
        while (isOp(",")) { advance(); names += ident() }
        eatOp(")")
        SrcMerge(names.result())
      } else if (isId("join") && peekAt(1) == TOp("(", peekAt(1).pos)) {
        advance(); eatOp("(")
        val names = Seq.newBuilder[String]
        names += ident()
        while (isOp(",")) { advance(); names += ident() }
        eatOp(")")
        SrcJoin(names.result())
      } else if (isId("timer") && peekAt(1) == TOp("(", peekAt(1).pos)) {
        advance(); eatOp("(")
        def durOf(e: VExpr): Long = e match {
          case VDur(us) => us
          case VInt(v)  => v * 1000000L // bare number = seconds
          case _        => fail("timer: expected a duration")
        }
        val period = durOf(expr())
        var delay = 0L
        while (isOp(",")) {
          advance(); val n = ident(); eatOp(":")
          val v = expr()
          if (n == "initial_delay") delay = durOf(v)
        }
        eatOp(")")
        SrcTimer(period, delay)
      } else {
        val n = ident()
        val alias = if (isId("as")) { advance(); Some(ident()) } else None
        SrcName(n, alias)
      }

    private def followedBy(): VOp = {
      eatOp("->")
      val matchAll = if (isId("all")) { advance(); true } else false
      val t = ident()
      val where = if (isId("where")) { advance(); Some(expr(filter = true)) } else None
      val alias = if (isId("as")) { advance(); Some(ident()) } else None
      OpFollowedBy(SeqStep(t, alias, where, matchAll))
    }

    private def dotOp(): VOp = {
      eatOp(".")
      val op = ident()
      op match {
        case "from" =>
          eatOp("(")
          val conn = ident()
          val params = if (isOp(",")) { advance(); namedArgList() } else Nil
          eatOp(")")
          OpFrom(conn, params)
        case "on"      => eatOp("("); val e = expr(); eatOp(")"); OpOn(e)
        case "process" => eatOp("("); val e = expr(); eatOp(")"); OpProcess(e)
        case "where"  => eatOp("("); val e = expr(); eatOp(")"); OpWhere(e)
        case "having" => eatOp("("); val e = expr(); eatOp(")"); OpHaving(e)
        case "filter" => eatOp("("); val e = expr(); eatOp(")"); OpWhere(e)
        case "select" =>
          eatOp("(")
          val items = Seq.newBuilder[(String, Option[VExpr])]
          def one(): Unit = {
            val n = ident()
            if (isOp(":")) { advance(); items += (n -> Some(expr())) }
            else items += (n -> None)
          }
          one(); while (isOp(",")) { advance(); one() }
          eatOp(")")
          OpSelect(items.result())
        case "window" =>
          eatOp("(")
          val positional = Seq.newBuilder[VExpr]
          val named = Seq.newBuilder[(String, VExpr)]
          def one(): Unit = peek match {
            case TId(n, _) if peekAt(1) == TOp(":", peekAt(1).pos) =>
              advance(); eatOp(":"); named += (n -> expr())
            case _ => positional += expr()
          }
          if (!isOp(")")) { one(); while (isOp(",")) { advance(); one() } }
          eatOp(")")
          OpWindow(positional.result(), named.result())
        case "aggregate" | "trend_aggregate" =>
          eatOp("(")
          val aggs = namedArgList()
          eatOp(")")
          OpAggregate(aggs)
        case "partition_by" =>
          eatOp("(")
          val cols = Seq.newBuilder[String]
          cols += ident()
          while (isOp(",")) { advance(); cols += ident() }
          eatOp(")")
          OpPartitionBy(cols.result())
        case "order_by" =>
          eatOp("(")
          val items = Seq.newBuilder[(VExpr, Boolean)]
          def one(): Unit = {
            val e = expr()
            val asc =
              if (isId("desc")) { advance(); false }
              else { if (isId("asc")) advance(); true }
            items += (e -> asc)
          }
          one(); while (isOp(",")) { advance(); one() }
          eatOp(")")
          OpOrderBy(items.result())
        case "limit" => eatOp("("); val n = intLit(); eatOp(")"); OpLimit(n)
        // engine/mod.rs: ".first() is shorthand for .limit(1)" — the
        // only op of the grammar's fork/any/all/concurrent/on_error/
        // map/collect group the reference actually executes (the rest
        // it rejects as unimplemented, and so do we)
        case "first" => eatOp("("); eatOp(")"); OpLimit(1)
        case "distinct" =>
          eatOp("(")
          val cols = Seq.newBuilder[String]
          if (!isOp(")")) { cols += ident(); while (isOp(",")) { advance(); cols += ident() } }
          eatOp(")")
          OpDistinct(cols.result())
        case "emit" =>
          val asType = if (isId("as")) { advance(); Some(ident()) } else None
          eatOp("(")
          val args = if (isOp(")")) Nil else namedArgList()
          eatOp(")")
          OpEmit(args, asType)
        case "to" =>
          eatOp("(")
          val conn = ident()
          val params = if (isOp(",")) { advance(); namedArgList() } else Nil
          eatOp(")")
          OpTo(conn, params)
        case "within" =>
          eatOp("("); val d = expr(); eatOp(")"); OpWithin(d)
        case "not" =>
          eatOp("(")
          val t = ident()
          val where = if (isId("where")) { advance(); Some(expr()) } else None
          eatOp(")")
          OpNot(SeqStep(t, None, where, matchAll = false))
        case "pattern" =>
          eatOp("(")
          val n = ident(); eatOp(":")
          val body = expr()
          eatOp(")")
          OpPattern(n, body)
        case "watermark" =>
          eatOp("("); val params = namedArgList(); eatOp(")"); OpWatermark(params)
        case "allowed_lateness" =>
          eatOp("("); val d = expr(); eatOp(")"); OpAllowedLateness(d)
        case "print" =>
          eatOp("(")
          val args = Seq.newBuilder[VExpr]
          if (!isOp(")")) { args += expr(); while (isOp(",")) { advance(); args += expr() } }
          eatOp(")")
          OpTapLike("print", args.result())
        case "log" | "tap" =>
          eatOp("(")
          val params = if (isOp(")")) Nil else namedArgList()
          eatOp(")")
          OpTapLike(op, params.map(_._2))
        case "enrich" =>
          eatOp("(")
          val conn = ident()
          val params = if (isOp(",")) { advance(); enrichParams() } else Nil
          eatOp(")")
          OpEnrich(conn, params)
        case "forecast" =>
          eatOp("(")
          val params = if (isOp(")")) Nil else namedArgList()
          eatOp(")")
          OpForecast(params)
        case "score" =>
          eatOp("(")
          val params = if (isOp(")")) Nil else scoreParams()
          eatOp(")")
          OpScore(params)
        case "context" =>
          eatOp("("); val n = ident(); eatOp(")"); OpContext(n)
        case other => fail(s"unsupported stream op '.$other'")
      }
    }

    /** enrich params: `key: expr` / `fields: [a, b]` / `fallback: lit` ... */
    private def enrichParams(): Seq[(String, VExpr)] = {
      val b = Seq.newBuilder[(String, VExpr)]
      def one(): Unit = {
        val n = ident(); eatOp(":")
        val v = if (isOp("[")) {
          advance()
          val items = Seq.newBuilder[VExpr]
          items += VRef(ident())
          while (isOp(",")) { advance(); items += VRef(ident()) }
          eatOp("]")
          VList(items.result())
        } else expr()
        b += (n -> v)
      }
      one(); while (isOp(",")) { advance(); one() }
      b.result()
    }

    /** score params: `model: "x.onnx"` / `inputs: [a, b]` */
    private def scoreParams(): Seq[(String, VExpr)] = enrichParams()

    private def namedArgList(): Seq[(String, VExpr)] = {
      val b = Seq.newBuilder[(String, VExpr)]
      def one(): Unit = {
        val n = ident(); eatOp(":")
        // `[...]` named args parse as full expression lists — the
        // primary's list literal subsumes the old config-only form
        // (same VList for `[a, b]`) and admits computed elements
        b += (n -> expr())
      }
      one(); while (isOp(",")) { advance(); one() }
      b.result()
    }

    private def intLit(): Long = peek match {
      case TInt(v, _) => advance(); v
      case _          => fail("expected integer")
    }

    // ------------------------------------------------------------ exprs
    /** @param filter inside a `->` step's where clause: `.ident(`
      *               terminates the expression (next stream op)
      */
    // expression-nesting guard: adversarial input like ((((…( must
    // surface as a VplParseError, not a StackOverflowError crashing
    // the caller's thread
    private var exprDepth = 0

    def expr(filter: Boolean = false): VExpr = {
      exprDepth += 1
      // 128 keeps well inside the smallest test-runner thread stacks
      // (~20 parser frames per nesting level); real programs nest <50
      if (exprDepth > 128)
        throw VplParseError("expression nesting deeper than 128",
          line(src, peek.pos))
      try expr0(filter) finally exprDepth -= 1
    }

    private def expr0(filter: Boolean): VExpr = {
      // lambda: `x => body`
      peek match {
        case TId(p, _) if peekAt(1) == TOp("=>", peekAt(1).pos) =>
          advance(); advance()
          return VLambda(Seq(p), expr(filter))
        // `(a, b) => body` (grammar.md lambda param_list; the pair
        // destructure sliding_pairs consumers use). Lookahead scans
        // ident (, ident)* ')' '=>' before committing — a plain
        // parenthesized expression falls through untouched.
        case TOp("(", _) =>
          var k = 1
          var ok = peekAt(k) match { case TId(_, _) => true; case _ => false }
          while (ok && peekAt(k + 1) == TOp(",", peekAt(k + 1).pos)) {
            k += 2
            ok = peekAt(k) match { case TId(_, _) => true; case _ => false }
          }
          if (ok && peekAt(k + 1) == TOp(")", peekAt(k + 1).pos) &&
              peekAt(k + 2) == TOp("=>", peekAt(k + 2).pos)) {
            advance() // (
            val ps = Seq.newBuilder[String]
            ps += ident()
            while (isOp(",")) { advance(); ps += ident() }
            eatOp(")"); eatOp("=>")
            return VLambda(ps.result(), expr(filter))
          }
        case _ => ()
      }
      rangeExpr(filter)
    }

    /** `a..b` / `a..=b` (grammar: range_expr). Encoded as a
      * `VCall("__range", start, end, inclusiveFlag)` so every AST
      * walker (inline/substitute/quals/...) traverses it for free.
      */
    private def rangeExpr(f: Boolean): VExpr = {
      val l = coalesceExpr(f)
      if (isOp("..=")) { advance(); VCall("__range", Seq(l, coalesceExpr(f), VBool(true))) }
      else if (isOp("..")) { advance(); VCall("__range", Seq(l, coalesceExpr(f), VBool(false))) }
      else l
    }

    /** `a ?? b` null-coalesce (docs/language/operators.md chaining
      * ops; the runtime's Expr::Coalesce).
      */
    private def coalesceExpr(f: Boolean): VExpr = {
      var l = orExpr(f)
      while (isOp("??")) { advance(); l = VBin("??", l, orExpr(f)) }
      l
    }

    private def orExpr(f: Boolean): VExpr = {
      var l = andExpr(f)
      while (isId("or")) { advance(); l = VBin("or", l, andExpr(f)) }
      l
    }
    private def andExpr(f: Boolean): VExpr = {
      var l = notExpr(f)
      while (isId("and")) { advance(); l = VBin("and", l, notExpr(f)) }
      l
    }
    private def notExpr(f: Boolean): VExpr =
      if (isId("not")) { advance(); VUn("not", notExpr(f)) } else cmpExpr(f)

    private def cmpExpr(f: Boolean): VExpr = {
      val l = bitOrExpr(f)
      val cmpOps = Seq("==", "!=", "<=", ">=", "<", ">")
      cmpOps.find(isOp) match {
        case Some(op) => advance(); VBin(op, l, bitOrExpr(f))
        case None if isId("in") =>
          advance(); VBin("in", l, rangeOrOperand(f))
        case None if isId("not") && peekAt(1) == TId("in", peekAt(1).pos) =>
          advance(); advance(); VBin("not in", l, rangeOrOperand(f))
        case None => l
      }
    }

    /** the RHS of `in` / `not in` admits a range (`x in 0..10`) —
      * comparison sits ABOVE range in the grammar, so re-admit it here
      */
    private def rangeOrOperand(f: Boolean): VExpr = {
      val r = bitOrExpr(f)
      if (isOp("..=")) { advance(); VCall("__range", Seq(r, bitOrExpr(f), VBool(true))) }
      else if (isOp("..")) { advance(); VCall("__range", Seq(r, bitOrExpr(f), VBool(false))) }
      else r
    }

    // bitwise chain (grammar: comparison > bitor > bitxor > bitand >
    // shift > additive)
    private def bitOrExpr(f: Boolean): VExpr = {
      var l = bitXorExpr(f)
      while (isOp("|")) { advance(); l = VBin("|", l, bitXorExpr(f)) }
      l
    }
    private def bitXorExpr(f: Boolean): VExpr = {
      var l = bitAndExpr(f)
      while (isOp("^")) { advance(); l = VBin("^", l, bitAndExpr(f)) }
      l
    }
    private def bitAndExpr(f: Boolean): VExpr = {
      var l = shiftExpr(f)
      while (isOp("&")) { advance(); l = VBin("&", l, shiftExpr(f)) }
      l
    }
    private def shiftExpr(f: Boolean): VExpr = {
      var l = addExpr(f)
      var more = true
      while (more) {
        if (isOp("<<")) { advance(); l = VBin("<<", l, addExpr(f)) }
        else if (isOp(">>")) { advance(); l = VBin(">>", l, addExpr(f)) }
        else more = false
      }
      l
    }
    private def addExpr(f: Boolean): VExpr = {
      var l = mulExpr(f)
      var more = true
      while (more) {
        if (isOp("+")) { advance(); l = VBin("+", l, mulExpr(f)) }
        else if (isOp("-")) { advance(); l = VBin("-", l, mulExpr(f)) }
        else more = false
      }
      l
    }
    private def mulExpr(f: Boolean): VExpr = {
      var l = powExpr(f)
      var more = true
      while (more) {
        if (isOp("*")) { advance(); l = VBin("*", l, powExpr(f)) }
        else if (isOp("/")) { advance(); l = VBin("/", l, powExpr(f)) }
        else if (isOp("%")) { advance(); l = VBin("%", l, powExpr(f)) }
        else more = false
      }
      l
    }
    private def powExpr(f: Boolean): VExpr = {
      val l = unaryExpr(f)
      if (isOp("**")) { advance(); VBin("**", l, powExpr(f)) } else l
    }
    private def unaryExpr(f: Boolean): VExpr =
      if (isOp("-")) { advance(); VUn("-", unaryExpr(f)) }
      else if (isOp("~")) { advance(); VUn("~", unaryExpr(f)) }
      else postfix(f)

    private def postfix(f: Boolean): VExpr = {
      var base = primary(f)
      var more = true
      while (more) {
        if (isOp(".")) {
          peekAt(1) match {
            case TId(field, _) =>
              val isCall = peekAt(2) == TOp("(", peekAt(2).pos)
              if (isCall && f) {
                // stream op boundary inside a filter — stop here
                more = false
              } else if (isCall) {
                advance(); advance(); advance() // . ident (
                val args = Seq.newBuilder[VExpr]
                if (!isOp(")")) { args += expr(); while (isOp(",")) { advance(); args += expr() } }
                eatOp(")")
                base = VMethod(base, field, args.result())
              } else {
                advance(); advance()
                base = base match {
                  case VRef(q) => VField(q, field)
                  case other   => VMethod(other, field, Nil)
                }
              }
            case _ => more = false
          }
        } else if (isOp("?.")) {
          // optional member access — null-safe field read (grammar:
          // optional_member_access; Column.getField is already
          // null-propagating, so it compiles like `.`)
          peekAt(1) match {
            case TId(field, _) =>
              advance(); advance()
              base = base match {
                case VRef(q) => VField(q, field)
                case other   => VMethod(other, field, Nil)
              }
            case _ => more = false
          }
        } else if (isOp("[")) {
          // slice `[a:b]` / `[:b]` / `[a:]` / `[:]` (checked before
          // plain index `[i]` as in the reference grammar). Encoded as
          // VMethod("__slice"/"__index") so AST walkers traverse them.
          advance()
          if (isOp(":")) {
            advance()
            val end = if (isOp("]")) VNull else expr()
            eatOp("]")
            base = VMethod(base, "__slice", Seq(VNull, end))
          } else {
            val first = expr()
            if (isOp(":")) {
              advance()
              val end = if (isOp("]")) VNull else expr()
              eatOp("]")
              base = VMethod(base, "__slice", Seq(first, end))
            } else {
              eatOp("]")
              base = VMethod(base, "__index", Seq(first))
            }
          }
        } else if (isOp("(")) {
          base match {
            case VRef(fn) =>
              advance()
              val args = Seq.newBuilder[VExpr]
              if (!isOp(")")) { args += expr(); while (isOp(",")) { advance(); args += expr() } }
              eatOp(")")
              base = VCall(fn, args.result())
            case _ => more = false
          }
        } else more = false
      }
      base
    }

    private def primary(filter: Boolean): VExpr = peek match {
      case TInt(v, _)   => advance(); VInt(v)
      case TFloat(v, _) => advance(); VNum(v)
      case TStr(s, _)   => advance(); VStr(s)
      case TDur(us, _)  => advance(); VDur(us)
      case TId("true", _)  => advance(); VBool(true)
      case TId("false", _) => advance(); VBool(false)
      case TId("null", _)  => advance(); VNull
      case TId("if", _) =>
        advance()
        val c = expr(filter); eatId("then"); val t = expr(filter)
        eatId("else"); val e = expr(filter)
        VIf(c, t, e)
      case TId("match", _) =>
        advance(); matchExpr(filter)
      case TId(s, _) => advance(); VRef(s)
      case TOp("(", _) =>
        advance(); val e = expr(); eatOp(")"); e
      case TOp("[", _) =>
        advance()
        val items = Seq.newBuilder[VExpr]
        if (!isOp("]")) { items += expr(); while (isOp(",")) { advance(); items += expr() } }
        eatOp("]")
        VList(items.result())
      case TOp("{", _) =>
        // `{name: expr, ...}` struct literal (nested emit payloads) /
        // `{"key": expr, ...}` map literal (imperative fn bodies) —
        // one node; string keys stay verbatim
        advance()
        val items = Seq.newBuilder[(String, VExpr)]
        def one(): Unit = {
          val n = peek match {
            case TStr(s, _) => advance(); s
            case _          => ident()
          }
          eatOp(":"); items += (n -> expr())
        }
        if (!isOp("}")) { one(); while (isOp(",")) { advance(); one() } }
        eatOp("}")
        VStruct(items.result())
      case _ => fail("expected an expression")
    }

    /** `match scrut: pat => expr ...` (grammar.md match_expr).
      * The reference delimits arms by NEWLINE inside an INDENT block;
      * here the arm list ends at the first token pair that isn't
      * `pattern =>` — the same whitespace-free stance as the
      * event/config blocks. Patterns are literals, `_`, or an
      * identifier that binds the scrutinee in its arm body.
      * Desugared to nested VIf (first match wins, top down; a
      * binder/wildcard arm catches everything below it; no arm
      * matching -> null), so every downstream AST walker and the
      * compiler handle it unchanged.
      */
    private def matchExpr(filter: Boolean): VExpr = {
      val scrut = expr(filter)
      eatOp(":")
      def atArrow(k: Int) = peekAt(k) == TOp("=>", peekAt(k).pos)
      def armStart: Boolean = peek match {
        case TId(_, _) | TInt(_, _) | TFloat(_, _) | TStr(_, _) |
            TDur(_, _) => atArrow(1)
        case TOp("-", _) => (peekAt(1) match {
          case TInt(_, _) | TFloat(_, _) | TDur(_, _) => true
          case _                                      => false
        }) && atArrow(2)
        case _ => false
      }
      // Left(literal) compares ==; Right(name) binds ("_" = wildcard)
      val arms = Seq.newBuilder[(Either[VExpr, String], VExpr)]
      var n = 0
      while (armStart) {
        val pat: Either[VExpr, String] = peek match {
          case TId("true", _)  => advance(); Left(VBool(true))
          case TId("false", _) => advance(); Left(VBool(false))
          case TId("null", _)  => advance(); Left(VNull)
          case TId(s, _)       => advance(); Right(s)
          case TInt(v, _)      => advance(); Left(VInt(v))
          case TFloat(v, _)    => advance(); Left(VNum(v))
          case TStr(s, _)      => advance(); Left(VStr(s))
          case TDur(us, _)     => advance(); Left(VDur(us))
          case TOp("-", _) =>
            advance()
            advance() match {
              case TInt(v, _)   => Left(VInt(-v))
              case TFloat(v, _) => Left(VNum(-v))
              case TDur(us, _)  => Left(VDur(-us))
              case other        => fail(s"bad match pattern ${show(other)}")
            }
          case other => fail(s"bad match pattern ${show(other)}")
        }
        eatOp("=>")
        arms += (pat -> expr(filter))
        n += 1
      }
      if (n == 0) fail("match: expected at least one 'pattern =>' arm")
      arms.result().foldRight(VNull: VExpr) {
        case ((Left(lit), body), rest) => VIf(VBin("==", scrut, lit), body, rest)
        case ((Right("_"), body), _)   => body
        case ((Right(name), body), _)  => subst(body, name, scrut)
      }
    }

    /** Capture-correct single-name substitution for match binder arms
      * (VLambda params shadow; VField quals are strings, so a binder
      * can't be used as a qualifier — reference patterns bind scalars).
      */
    private def subst(e: VExpr, n: String, v: VExpr): VExpr = e match {
      case VRef(`n`)         => v
      case VUn(op, x)        => VUn(op, subst(x, n, v))
      case VBin(op, l, r)    => VBin(op, subst(l, n, v), subst(r, n, v))
      case VCall(f, as)      => VCall(f, as.map(subst(_, n, v)))
      case VMethod(t, m, as) => VMethod(subst(t, n, v), m, as.map(subst(_, n, v)))
      case VIf(c, a, b)      => VIf(subst(c, n, v), subst(a, n, v), subst(b, n, v))
      case VList(is)         => VList(is.map(subst(_, n, v)))
      case VStruct(is)       => VStruct(is.map { case (k, x) => k -> subst(x, n, v) })
      case VLambda(ps, b) if !ps.contains(n) => VLambda(ps, subst(b, n, v))
      case other             => other
    }
  }
}
