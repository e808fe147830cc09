package graft.vpl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dsl._
import graft.sources.EventFile
import VplAst._

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

final case class VplCompileError(msg: String) extends RuntimeException(msg)

/** Source binding: event type name → typed DataFrame carrying the
  * injected columns `event_id` (long, arrival order) and `ts`
  * (timestamp, event time) plus the event's own fields.
  */
trait VplSource {
  def resolve(eventType: String): DataFrame
  /** Every event in arrival order (for model fitting, e.g. the
    * `.forecast` transition model): event_id, ts, event_type, plus
    * whatever payload columns the source carries.
    */
  def allEvents: DataFrame
}

/** `.evt`-file source (reference test-injection format). Event time =
  * BATCH / `@dur` offsets from an epoch origin; arrival order =
  * file line order. Field types come from the program's `event`
  * declarations when present, else are inferred from the payload
  * literals (`"x"` → str, `1` → int, `1.0` → float, `true` → bool) —
  * the reference's dynamically-typed payloads behave the same way
  * (crates/varpulis-runtime/src/event_file.rs).
  *
  * Schema inference collects one first-seen raw literal per field —
  * a driver-side action bounded by the (tiny, test-only) .evt file's
  * field count, exactly like Spark's own csv/json inferSchema pass.
  */
final class EvtSource(spark: SparkSession, paths: Seq[String],
    decls: Map[String, VEvent]) extends VplSource {

  private val base: DataFrame = EventFile.read(spark, paths).cache()

  private val inferred: Map[String, Seq[(String, String)]] = {
    import org.apache.spark.sql.Row
    val rows = base
      .select(col("event_type"), col("line_no"), explode(col("fields_raw")))
      .groupBy("event_type", "key")
      .agg(min_by(col("value"), col("line_no")).as("first_raw"))
      .collect()
    rows.groupBy { case Row(t: String, _, _) => t }
      .map { case (t, rs) =>
        t -> rs.sortBy { case Row(_, k: String, _) => k }.toSeq.map {
          case Row(_, k: String, raw: String) =>
            val ty =
              if (raw.startsWith("\"")) "str"
              else if (raw.matches("^-?[0-9]+$")) "int"
              else if (raw.matches("^-?[0-9]*\\.[0-9]+$")) "float"
              else if (raw == "true" || raw == "false") "bool"
              else "str"
            k -> ty
        }
      }
  }

  def resolve(eventType: String): DataFrame = {
    val fields: Seq[(String, String)] = decls.get(eventType) match {
      case Some(ev) => ev.fields
      case None => inferred.getOrElse(eventType,
        // type never seen in the file and not declared → an empty
        // stream (the reference's runtime simply never fires such
        // transitions). The raw `fields` map rides along so the
        // compiler can materialize referenced names as dynamic
        // payload columns (reference events are schemaless until
        // bound — see the dynamic-payload block in stream()).
        return base.filter(lit(false))
          .select(col("line_no").as("event_id"),
            timestamp_millis(col("delay_ms")).as("ts"),
            col("fields")))
    }
    val sparkType: String => String = {
      case "int" => "long"; case "float" => "double"; case "bool" => "boolean"
      case "timestamp" => "timestamp"; case _ => "string"
    }
    val fieldCols = fields.collect {
      // injected event time is authoritative for `ts` (reference
      // payloads never carry it; BATCH/@ offsets are the event time)
      case (f, t) if f != "ts" =>
        element_at(col("fields"), f).cast(sparkType(t.stripSuffix("?"))).as(f)
    }
    base.filter(col("event_type") === eventType)
      .select(col("line_no").as("event_id") +:
        timestamp_millis(col("delay_ms")).as("ts") +: fieldCols: _*)
  }

  def allEvents: DataFrame = base.select(
    col("line_no").as("event_id"),
    timestamp_millis(col("delay_ms")).as("ts"),
    col("event_type"), col("fields"))
}

/** Structured-Streaming source over an [[graft.sources.EventReplay]]
  * staging: field types come from declarations (else inferred from a
  * batch read of the same staged files), but the returned frames are
  * true streaming DataFrames — one micro-batch per .evt BATCH group.
  *
  * resolve() does NOT filter by event type: the stream's watermark
  * must observe every event (incl. the end-of-stream sentinel) or
  * append-mode windows never close. The compiler applies the type
  * filter after `.watermark(...)` instead.
  */
final class StreamingEvtSource(spark: SparkSession,
    staged: graft.sources.EventReplay.Staged,
    decls: Map[String, VEvent]) extends VplSource {

  private val batch = spark.read.parquet(staged.dir)

  private val inferred: Map[String, Seq[(String, String)]] = {
    import org.apache.spark.sql.Row
    batch.select(col("event_type"), col("event_id"), explode(col("fields_raw")))
      .groupBy("event_type", "key")
      .agg(min_by(col("value"), col("event_id")).as("first_raw"))
      .collect()
      .groupBy { case Row(t: String, _, _) => t }
      .map { case (t, rs) =>
        t -> rs.sortBy { case Row(_, k: String, _) => k }.toSeq.map {
          case Row(_, k: String, raw: String) =>
            val ty =
              if (raw.startsWith("\"")) "str"
              else if (raw.matches("^-?[0-9]+$")) "int"
              else if (raw.matches("^-?[0-9]*\\.[0-9]+$")) "float"
              else if (raw == "true" || raw == "false") "bool"
              else "str"
            k -> ty
        }
      }
  }

  def resolve(eventType: String): DataFrame = {
    val fields = decls.get(eventType).map(_.fields)
      .orElse(inferred.get(eventType)).getOrElse(Nil)
    val sparkType: String => String = {
      case "int" => "long"; case "float" => "double"; case "bool" => "boolean"
      case "timestamp" => "timestamp"; case _ => "string"
    }
    val fieldCols = fields.collect {
      case (f, t) if f != "ts" =>
        element_at(col("fields"), f).cast(sparkType(t.stripSuffix("?"))).as(f)
    }
    graft.sources.EventReplay.readStream(spark, staged)
      .select(col("event_id") +: col("ts") +: col("event_type") +: fieldCols: _*)
  }

  /** Model fitting happens on the already-staged batch data (a model
    * is training state, not streaming output).
    */
  def allEvents: DataFrame =
    batch.select(col("event_id"), col("ts"), col("event_type"), col("fields"))

  /** The unprojected stream — all types, fields as a raw map — for
    * operators that type their own payloads (streaming sequences).
    */
  def rawStream: DataFrame =
    graft.sources.EventReplay.readStream(spark, staged)

  def fieldsOf(eventType: String): Seq[(String, String)] =
    decls.get(eventType).map(_.fields)
      .orElse(inferred.get(eventType)).getOrElse(Nil)
}

/** Events-parquet source: VPL event types are the values of the
  * `event_type` column of the driver-generated events table — the
  * binding the registered x-queries use so their DuckDB oracles run
  * on the same data.
  */
final class TableSource(spark: SparkSession, dir: String) extends VplSource {
  private val events = graft.Tables(spark, dir).events
  def resolve(eventType: String): DataFrame =
    events.filter(col("event_type") === eventType).drop("event_type")
  def allEvents: DataFrame = events
}

/** Compiles a parsed [[VplAst.VProgram]] to Spark DataFrames — one per
  * `stream` declaration — over the operators this library already
  * implements (EventStream windows/aggregates, sequence joins as in
  * [[graft.cep.Pattern]]). Every stream of every .vpl file in the
  * reference's examples/ and tests/scenarios compiles and runs
  * (VplCoverageSpec), in batch or — with `streaming = true` —
  * Structured Streaming mode.
  *
  * Semantics notes (vs crates/varpulis-runtime):
  *  - `A -> B` compiles to the skip-till-any-match join chain (every
  *    in-order combination), the same batch realization the p1..p10
  *    queries use; `-> all` is identical here because the batch
  *    surface already enumerates all matches.
  *  - `.within(d)` bounds last.ts − first.ts; `.not(T where p)` is a
  *    left-anti join over the same window (sase.rs negation-timeout
  *    semantics); declared `pattern` NOT items are position-aware.
  *  - single-expression `fn`s are inlined at call sites; `let`-bound
  *    bodies substitute; for/emit statement fns unroll via
  *    `.process()` (all of it stays inside Catalyst).
  *  - stream-stream `join(S1..Sn).on(...)` folds conjunct-linked
  *    equi-joins (a cartesian is a compile error); `.window(d)` on a
  *    join bounds all sides to one tumbling bucket.
  *  - `.enrich` binds per-connector lookup DataFrames (broadcast
  *    join); unbound connectors degrade to fallback/NULL + "miss".
  *  - `.forecast` truncates a sequence to its partial-match prefix
  *    and annotates transition-model completion probabilities.
  *  - refs to fields an event doesn't carry resolve to NULL, like the
  *    reference's dynamically-typed payload lookups.
  */
final class VplCompiler(program: VProgram, source: VplSource,
    /** streaming mode: sources are streaming DataFrames; `.watermark`
      * becomes withWatermark, the event-type filter is applied after
      * it (the sentinel must reach the watermark node), and ops with
      * no incremental realization (order_by/limit/sequences/count
      * windows) are rejected up front.
      */
    streaming: Boolean = false,
    /** `.enrich(Connector, ...)` bindings: connector name → lookup
      * DataFrame. A connector with no binding enriches to fallbacks /
      * NULLs with enrich_status "miss" (the reference degrades the
      * same way when a connector is down).
      */
    lookups: Map[String, DataFrame] = Map.empty,
    /** `.to(Connector)` bindings: connector name → sink. Bound sinks
      * are written when the stream compiles (the batch flavor of the
      * reference's sink wiring); unbound `.to`s stay no-ops, so
      * compiling a program never needs live brokers.
      */
    sinks: Map[String, graft.sources.Connector] = Map.empty,
    /** `.from(Connector, ...)` SOURCE bindings: connector name → a
      * real [[graft.sources.Connector]] (build them from the
      * program's own declarations with [[ConnectorBinder.bind]]). A
      * bound head stream reads the connector's landing dir under the
      * event declaration's schema instead of the ambient test source;
      * per-op `topic:`/`subject:`/`channel:` params re-aim the
      * connector. Events may carry their own ISO-8601 `ts`; rows
      * without one get arrival-order synthetic event time (the
      * reference's kafka source also stamps arrival time,
      * kafka.rs:274). Unbound `.from`s keep reading the ambient
      * source, so nothing needs live brokers.
      */
    sourceConns: Map[String, graft.sources.Connector] = Map.empty,
    /** `.score(model: "name", ...)` bindings: model name → pluggable
      * [[graft.ml.Score.Model]]. An unbound model scores with the
      * deterministic stand-in (see OpScore below) so scoring.rs-shaped
      * programs compile and run without an ONNX runtime (a §6
      * non-goal in this zero-egress build).
      */
    models: Map[String, graft.ml.Score.Model] = Map.empty) {

  private val fns: Map[String, VFn] = program.fns.map(f => f.name -> f).toMap
  /** let/var/const bindings folded IN ORDER with eager substitution:
    * a reassignment's RHS (`x := x * 1.1`, 11_variables.vpl) sees the
    * previous binding's expression, so later streams read the final
    * value and self-reference can never recurse.
    */
  private val letVals: Map[String, VExpr] =
    program.lets.foldLeft(Map.empty[String, VExpr]) { case (acc, l) =>
      acc + (l.name -> substitute(l.value, acc))
    }

  private val compiled = mutable.LinkedHashMap.empty[String, Try[DataFrame]]

  /** Compile every stream in declaration order. */
  def compileAll(): Map[String, Try[DataFrame]] = {
    program.streams.foreach { s =>
      compiled.getOrElseUpdate(s.name, Try(compileStream(s)))
    }
    compiled.toMap.map { case (n, t) => n -> t.map(stripHidden) }
  }

  /** Compile all streams, failing on the first error. */
  def compileAllStrict(): Seq[(String, DataFrame)] =
    program.streams.map { s =>
      s.name -> (compiled.getOrElseUpdate(s.name, Try(compileStream(s))) match {
        case Success(df) => stripHidden(df)
        case Failure(e)  => throw e
      })
    }

  /** Compile a declared `pattern Name = ...` (SASE+ subset: SEQ of
    * positive non-Kleene items with per-item predicates, single
    * filtered refs, and OR over refs — the combinators the reference
    * itself evaluates today; Kleene/NOT inside declared patterns are
    * parse-level only, like the reference's "stored for reference"
    * note in examples/reusable_patterns.vpl).
    */
  def compilePattern(name: String): DataFrame = {
    val decl = program.patterns.find(_.name == name)
      .getOrElse(throw VplCompileError(s"no pattern '$name'"))
    val keys = decl.partitionBy.toSeq

    def itemDf(it: SaseItem): DataFrame = {
      val df = resolveAny(it.eventType)
      val cols = df.columns.toSet
      val ctx = ExprCtx(
        bare = f => if (cols(f)) Some(col(f)) else None,
        qualified = (_, _) => None)
      it.where.map(e => df.filter(translate(e, ctx))).getOrElse(df)
    }

    decl.expr match {
      case SaseRef(it) if !it.negated && it.kleene.isEmpty => itemDf(it)
      case SaseSeq(items) if items.exists(!_.negated) =>
        // positives drive the join chain; `T+` compiles like a plain
        // detection step (the batch surface already enumerates each
        // in-order combination — the same `-> all` equivalence noted
        // in the class scaladoc; trend COUNTS live in TrendAggregate)
        val positives = items.zipWithIndex.filter { case (it, _) => !it.negated }
        val aliases = positives.map { case (it, i) =>
          it.alias.getOrElse(s"s$i")
        }
        // `partition by k` → equi-join conjunct on every transition
        // (join condition, not post-filter: one shuffle per step on k)
        val bounds = positives.zipWithIndex.map { case ((it, _), pi) =>
          val keyEq = if (pi == 0) Nil
            else keys.map(k => VBin("==", VRef(k), VField(aliases(pi - 1), k)))
          val whereAll = (it.where.toSeq ++ keyEq)
            .reduceOption((a, b) => VBin("and", a, b))
          // raw df: local conjuncts filter inside buildSequence, cross
          // conjuncts become join conditions
          Bound(aliases(pi), resolveAny(it.eventType), whereAll)
        }
        val st = new SeqState(bounds.head)
        st.steps ++= bounds.tail
        st.withinUs = decl.withinUs
        var out = buildSequence(st)
        // NOT items: absence BETWEEN their neighbouring positives
        // (sase.rs NegationInfo position semantics) — a left-anti
        // time/order-bounded join per NOT
        val firstAlias = aliases.head
        items.zipWithIndex.filter(_._1.negated).foreach { case (neg, p) =>
          val negAlias = s"__not_$p"
          val negDf0 = withOrderCol(resolveAny(neg.eventType))
          val negCols = negDf0.columns.toSet
          val pre = prefixed(negDf0, negAlias)
          val nctx = ExprCtx(
            bare = f => if (negCols(f)) Some(col(s"${negAlias}__$f")) else None,
            qualified = (q, f) =>
              if (q == negAlias && negCols(f)) Some(col(s"${negAlias}__$f"))
              else None)
          val whereCond = neg.where.map(e => translate(e, nctx)).getOrElse(lit(true))
          val keyEq = keys.map(k =>
            col(s"${negAlias}__$k") === col(s"${firstAlias}__$k"))
            .reduceOption(_ && _).getOrElse(lit(true))
          val prevPos = positives.reverse.collectFirst {
            case (_, i) if i < p => aliases(positives.indexWhere(_._2 == i))
          }
          val nextPos = positives.collectFirst {
            case (_, i) if i > p => aliases(positives.indexWhere(_._2 == i))
          }
          val lower = prevPos.map(a =>
            col(s"${negAlias}__event_id") > col(s"${a}__event_id"))
            .getOrElse(lit(true))
          val upper = nextPos.map(a =>
            col(s"${negAlias}__event_id") < col(s"${a}__event_id"))
            .getOrElse(decl.withinUs.map(d =>
              unix_micros(col(s"${negAlias}__ts")) -
                unix_micros(col(s"${firstAlias}__ts")) <= lit(d))
              .getOrElse(lit(true)))
          out = out.join(pre, keyEq && whereCond && lower && upper, "left_anti")
        }
        out
      case SaseOr(_, _) =>
        def refs(e: SaseExpr): Seq[SaseItem] = e match {
          case SaseOr(l, r) => refs(l) ++ refs(r)
          case SaseRef(it) if !it.negated && it.kleene.isEmpty => Seq(it)
          case other => throw VplCompileError(s"unsupported OR operand: $other")
        }
        refs(decl.expr).map { it =>
          itemDf(it).select(col("event_id"), col("ts"),
            lit(it.eventType).as("event_type"))
        }.reduce(_.unionByName(_))
      case other =>
        throw VplCompileError(s"pattern '$name' uses combinators outside the compiled subset: $other")
    }
  }

  def stream(name: String): DataFrame = {
    compileAll()
    compiled.get(name) match {
      case Some(Success(df)) => stripHidden(df)
      case Some(Failure(e))  => throw e
      case None              => throw VplCompileError(s"no stream '$name'")
    }
  }

  /** Sequence joins order on event_id; a derived stream (an
    * aggregate's output) no longer carries one, so arrival order is
    * its event time (the reference emits derived events stamped with
    * the window's time — ordering by ts matches), with a
    * deterministic content-hash tiebreak so two simultaneous derived
    * events (two zones alerting in the same window) still order.
    */
  private def withOrderCol(df0: DataFrame): DataFrame = {
    var df = df0
    if (!df.columns.contains("ts") && df.columns.contains("win_start"))
      df = df.withColumn("ts", timestamp_seconds(col("win_start")))
    if (!df.columns.contains("event_id") && df.columns.contains("ts"))
      df = df.withColumn("event_id",
        unix_micros(col("ts")) * 1000L +
          pmod(xxhash64(df.columns.map(col): _*), lit(1000L)))
    df
  }

  /** Restore hidden time/order columns when composing over a derived
    * stream; strip them entirely for the public surface.
    */
  private def unhide(df: DataFrame): DataFrame = {
    var d = df
    Seq("ts", "event_id").foreach { f =>
      if (!d.columns.contains(f) && d.columns.contains(s"__hidden_$f"))
        d = d.withColumnRenamed(s"__hidden_$f", f)
    }
    d.drop("__hidden_ts", "__hidden_event_id")
  }

  private def stripHidden(df: DataFrame): DataFrame =
    df.drop("__hidden_ts", "__hidden_event_id")

  private def resolveAny(name: String): DataFrame =
    program.streams.find(_.name == name) match {
      case Some(s) =>
        compiled.getOrElseUpdate(name, Try(compileStream(s))) match {
          case Success(df) => unhide(df)
          case Failure(e)  => throw e
        }
      case None =>
        // an event type whose instances arrive via connector-bound
        // head streams (`stream Input = StockTick.from(Broker,
        // topic:)`) participates in the event universe like any
        // staged event — pattern declarations over the type (the
        // reference's kafka 04_kleene benchmark) read the bound
        // landing dirs; several topics of one type union
        val boundHeads = program.streams.collect {
          case VStream(_, SrcName(n, _), ops) if n == name =>
            ops.collectFirst {
              case OpFrom(c, p) if sourceConns.contains(c) =>
                (sourceConns(c), p)
            }
        }.flatten
        if (boundHeads.nonEmpty)
          boundHeads.map { case (c, p) => boundSource(c, p, name) }
            .reduce(_.unionByName(_, allowMissingColumns = true))
        else source.resolve(name)
    }

  // ------------------------------------------------------------ sequences
  private final case class Bound(alias: String, df: DataFrame,
      where: Option[VExpr], eventType: String = "",
      matchAll: Boolean = false)

  private final class SeqState(head: Bound) {
    val steps: mutable.Buffer[Bound] = mutable.Buffer(head)
    var withinUs: Option[Long] = None
    val negs: mutable.Buffer[SeqStep] = mutable.Buffer.empty
    val postFilters: mutable.Buffer[VExpr] = mutable.Buffer.empty
    /** aliases truncated by `.forecast` — the final step hasn't
      * happened yet, so its field refs resolve to NULL
      */
    val ghosts: mutable.Set[String] = mutable.Set.empty
  }

  private def prefixed(df: DataFrame, alias: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${alias}__$c"))

  /** `.forecast(...)` param bundle shared by the batch and streaming
    * arms (builtins.md "Forecast Modes"): (mode, depthCap, conformal,
    * hawkes, minProb). Validation errors are VplCompileError, never
    * internal Spark failures.
    */
  private def forecastParams(pm: Map[String, VExpr])
      : (String, Int, Boolean, Boolean, Option[Double]) = {
    val mode = pm.get("mode") match {
      case Some(VStr(m)) =>
        if (!Set("fast", "accurate", "balanced")(m))
          throw VplCompileError(
            s".forecast mode must be fast|accurate|balanced, got '$m'")
        m
      case _ => "balanced"
    }
    val depthCap = pm.get("max_depth") match {
      case Some(VInt(n)) =>
        if (n < 1 || n > 16) throw VplCompileError(
          s".forecast max_depth must be in [1, 16], got $n")
        n.toInt
      case Some(other) => throw VplCompileError(
        s".forecast max_depth: expected an integer literal, got $other")
      case None => if (mode == "accurate") 5 else 3
    }
    def boolOr(key: String, dflt: Boolean): Boolean = pm.get(key) match {
      case Some(VBool(b)) => b
      case Some(other) => throw VplCompileError(
        s".forecast $key: expected true|false, got $other")
      case None => dflt
    }
    val conformal = boolOr("conformal", mode != "fast")
    val hawkes = boolOr("hawkes", mode == "accurate")
    val minProb = pm.get("confidence") match {
      case Some(VNum(p)) => Some(p)
      case Some(VInt(p)) => Some(p.toDouble)
      // a non-numeric value must not silently compile as "no
      // threshold" (confidence: "high" dropping the filter entirely)
      case Some(other) => throw VplCompileError(
        s".forecast confidence: expected a numeric literal in [0, 1], got $other")
      case None => None
    }
    minProb.filter(p => p < 0.0 || p > 1.0).foreach(p =>
      throw VplCompileError(
        s".forecast confidence must be in [0, 1], got $p"))
    (mode, depthCap, conformal, hawkes, minProb)
  }

  private def conjuncts(e: VExpr): Seq[VExpr] = e match {
    case VBin("and", l, r) => conjuncts(l) ++ conjuncts(r)
    case other             => Seq(other)
  }

  private def aliasRefs(e: VExpr): Set[String] = e match {
    case VField(q, _)     => Set(q)
    case VBin(_, l, r)    => aliasRefs(l) ++ aliasRefs(r)
    case VUn(_, x)        => aliasRefs(x)
    case VCall(_, args)   => args.flatMap(aliasRefs).toSet
    case VMethod(t, _, a) => aliasRefs(t) ++ a.flatMap(aliasRefs)
    case VIf(c, t, f)     => aliasRefs(c) ++ aliasRefs(t) ++ aliasRefs(f)
    case VList(items)     => items.flatMap(aliasRefs).toSet
    case VStruct(items)   => items.flatMap(i => aliasRefs(i._2)).toSet
    case _                => Set.empty
  }

  private def buildSequence(st: SeqState): DataFrame = {
    val aliases = st.steps.map(_.alias)
    val first = aliases.head

    // head: local filter (rare) then prefix
    def localDf(b: Bound): DataFrame = {
      val cols = b.df.columns.toSet
      val locals = b.where.toSeq.flatMap(conjuncts)
        .filter(c => aliasRefs(c).forall(_ == b.alias))
      val ctx = ExprCtx(
        bare = f => if (cols(f)) Some(col(f)) else None,
        qualified = (q, f) =>
          if (q == b.alias && cols(f)) Some(col(f)) else None)
      locals.foldLeft(b.df)((d, c) => d.filter(translate(c, ctx)))
    }

    var acc = prefixed(localDf(st.steps.head), first)
    var prevAlias = first
    val boundCols = mutable.Map(first -> st.steps.head.df.columns.toSet)

    for (b <- st.steps.tail) {
      val cols = b.df.columns.toSet
      val crossConjuncts = b.where.toSeq.flatMap(conjuncts)
        .filterNot(c => aliasRefs(c).forall(_ == b.alias))
      val pre = prefixed(localDf(b), b.alias)
      val joinCtx = ExprCtx(
        bare = f => if (cols(f)) Some(col(s"${b.alias}__$f")) else None,
        qualified = (q, f) =>
          (if (q == b.alias) Some(cols) else boundCols.get(q)).map(cs =>
            if (cs(f)) col(s"${q}__$f") else lit(null)))
      val ordered = col(s"${b.alias}__event_id") > col(s"${prevAlias}__event_id")
      val timeBound = st.withinUs.map { d =>
        unix_micros(col(s"${b.alias}__ts")) - unix_micros(col(s"${first}__ts")) <=
          lit(d)
      }.getOrElse(lit(true))
      val cross = crossConjuncts.map(c => translate(c, joinCtx))
        .reduceOption(_ && _).getOrElse(lit(true))
      acc = acc.join(pre, ordered && timeBound && cross)
      boundCols(b.alias) = cols
      prevAlias = b.alias
    }

    // cross-step `.where(...)` after the sequence
    val postCtx = seqCtx(st)
    acc = st.postFilters.foldLeft(acc)((d, e) => d.filter(translate(e, postCtx)))

    // `.not(T where p)` — absence over the same window: left-anti join
    for (neg <- st.negs) {
      val negAlias = s"__neg_${neg.eventType}"
      val negDf = withOrderCol(resolveAny(neg.eventType))
      val negCols = negDf.columns.toSet
      val pre = prefixed(negDf, negAlias)
      val ctx = ExprCtx(
        bare = f => if (negCols(f)) Some(col(s"${negAlias}__$f")) else None,
        qualified = (q, f) =>
          (if (q == negAlias) Some(negCols) else boundCols.get(q)).map(cs =>
            if (cs(f)) col(s"${q}__$f") else lit(null)))
      val cond = neg.where.map(e => translate(e, ctx)).getOrElse(lit(true))
      val afterLast = col(s"${negAlias}__event_id") > col(s"${prevAlias}__event_id")
      val timeBound = st.withinUs.map { d =>
        unix_micros(col(s"${negAlias}__ts")) - unix_micros(col(s"${first}__ts")) <=
          lit(d)
      }.getOrElse(lit(true))
      acc = acc.join(pre, cond && afterLast && timeBound, "left_anti")
    }
    acc
  }

  /** emit/where context over a built sequence: `alias.field` →
    * `alias_field`; bare `field` resolves through the steps, last
    * match wins (the reference resolves against the most recent
    * event).
    */
  private def seqCtx(st: SeqState): ExprCtx = {
    val byAlias = st.steps.map(b => b.alias -> b.df.columns.toSet).toMap
    ExprCtx(
      bare = f =>
        st.steps.reverse.collectFirst {
          case b if byAlias(b.alias)(f) => col(s"${b.alias}__$f")
        },
      // known alias + missing field → NULL (dynamic payloads); only an
      // unknown alias is an error
      qualified = (q, f) =>
        byAlias.get(q).map(cols =>
          if (cols(f)) col(s"${q}__$f") else lit(null))
          .orElse(if (st.ghosts(q)) Some(lit(null)) else None))
  }

  /** Stream-stream `join(...)` (`.on` condition): folded left-to-right,
    * each input attached by the `.on` conjuncts it can satisfy — a
    * chain of (mostly equi-) joins Catalyst can plan, never a silent
    * cartesian (an input no conjunct links is a compile error).
    * Leftover conjuncts (referencing 3+ streams) become post-filters.
    */
  private def buildJoin(ins: Seq[(String, DataFrame)], on: VExpr): DataFrame = {
    val names = ins.map(_._1)
    val aliases = joinTypeAliases(names)
    def quals(x: VExpr): Set[String] = x match {
      case VField(q, _) if names.contains(q) => Set(q)
      case VField(q, _) if aliases.contains(q) => Set(aliases(q))
      case VBin(_, l, r)      => quals(l) ++ quals(r)
      case VUn(_, y)          => quals(y)
      case VCall(_, as)       => as.flatMap(quals).toSet
      case VMethod(t, _, as)  => quals(t) ++ as.flatMap(quals).toSet
      case VIf(c, a, b)       => quals(c) ++ quals(a) ++ quals(b)
      case VList(is)          => is.flatMap(quals).toSet
      case VStruct(is)        => is.flatMap(i => quals(i._2)).toSet
      case _                  => Set.empty
    }
    val jc = joinCtx(ins)
    val remaining = mutable.Buffer(conjuncts(inlineFns(on)): _*)
    var joined = Set(names.head)
    var acc = ins.head._2
    ins.tail.foreach { case (n, d) =>
      val usable = remaining.filter { c =>
        val q = quals(c); q.contains(n) && q.subsetOf(joined + n)
      }
      if (usable.isEmpty)
        throw VplCompileError(
          s"join: no .on conjunct links stream '$n' (cartesian refused)")
      remaining --= usable
      acc = acc.join(d, usable.map(translate(_, jc)).reduce(_ && _))
      joined += n
    }
    remaining.foreach(c => acc = acc.filter(translate(c, jc)))
    acc
  }

  /** `Name.field` over prefixed join inputs; bare fields resolve
    * first-stream-wins; known stream + missing field → NULL (dynamic
    * payload semantics, as in [[seqCtx]]).
    */
  /** Event-type qualifier aliases for join inputs: the reference
    * accepts `Transaction.user_id` where the input STREAM is named
    * `Transactions` (qualify by the stream's event type). Maps each
    * type to its input stream when the mapping is unambiguous.
    */
  private def joinTypeAliases(names: Seq[String]): Map[String, String] =
    names.flatMap { n =>
      program.streams.find(_.name == n).flatMap(_.source match {
        case SrcName(t, _) if t != n => Some(t -> n)
        case _ => None
      })
    }.groupBy(_._1).collect { case (t, Seq((_, n))) => t -> n }

  private def joinCtx(ins: Seq[(String, DataFrame)]): ExprCtx = {
    val byName = ins.map { case (n, d) =>
      n -> d.columns.map(_.stripPrefix(s"${n}__")).toSet
    }.toMap
    val aliases = joinTypeAliases(ins.map(_._1))
    def resolveQ(q: String): Option[String] =
      if (byName.contains(q)) Some(q) else aliases.get(q)
    ExprCtx(
      bare = f => ins.collectFirst {
        case (n, _) if byName(n)(f) => col(s"${n}__$f")
      },
      qualified = (q, f) => resolveQ(q).map { n =>
        if (byName(n)(f)) col(s"${n}__$f") else lit(null)
      })
  }

  // ------------------------------------------------------------ expressions
  private final case class ExprCtx(
      bare: String => Option[Column],
      qualified: (String, String) => Option[Column],
      // (partition keys, arrival-order column) for the analytic window
      // builtins lag/lead/row_number/rank — populated only where a
      // batch pipeline's select/emit can host a window function
      analytic: Option[(Seq[String], String)] = None)

  private def scalarCtx(df: DataFrame, headAlias: Option[String]): ExprCtx = {
    val cols = df.columns.toSet
    ExprCtx(
      bare = f => if (cols(f)) Some(col(f)) else None,
      qualified = (q, f) =>
        if (headAlias.contains(q))
          Some(if (cols(f)) col(f) else lit(null))
        else None)
  }

  private def inlineFns(e: VExpr, depth: Int = 0): VExpr = {
    if (depth > 20) throw VplCompileError("fn inlining too deep (recursive fn?)")
    e match {
      case VCall(name, args)
          if fns.contains(name) && fns(name).stmts.nonEmpty &&
            !fns(name).stmts.exists(_.isInstanceOf[SEmitStmt]) =>
        // imperative statement body (while/if/assignment/recursion —
        // imperative_benchmark.rs): constant-argument calls evaluate
        // ONCE at compile time through the fuel-capped interpreter
        // and re-enter the plan as a literal (the reference
        // interprets the same body per event; with constant args the
        // value is a per-event constant). Event-field-argument calls
        // stay as calls here and compile to the per-row interpreter
        // fold ([[StmtFnCall]]) in translate. emit-bodied fns stay on
        // the .process() unroll path.
        val inlined = args.map(inlineFns(_, depth + 1))
        VplInterp.constArgs(inlined) match {
          case Some(vals) =>
            try VplInterp.toExpr(VplInterp.callFn(fns, fns(name), vals))
            catch {
              case ie: VplInterp.InterpError => throw VplCompileError(
                s"fn $name: ${ie.getMessage}")
            }
          case None => VCall(name, inlined)
        }
      case VCall(name, args)
          if fns.contains(name) && fns(name).stmts.isEmpty =>
        val f = fns(name)
        if (f.params.size != args.size)
          throw VplCompileError(s"fn $name: expected ${f.params.size} args, got ${args.size}")
        val sub = f.params.map(_._1).zip(args).toMap
        inlineFns(substitute(f.body, sub), depth + 1)
      case VCall(n, args) =>
        // list/map-shaped builtins over constants fold here (a
        // Seq-valued constant has no column translation); everything
        // else stays in the compiled vocabulary
        val in = args.map(inlineFns(_, depth))
        VplInterp.constArgs(in)
          .flatMap(vs => VplInterp.tryFold(n, vs))
          .fold(VCall(n, in): VExpr)(VplInterp.toExpr)
      case VBin(op, l, r)   => VBin(op, inlineFns(l, depth), inlineFns(r, depth))
      case VUn(op, x)       => VUn(op, inlineFns(x, depth))
      case VMethod(t, "__index", Seq(i)) =>
        val t2 = inlineFns(t, depth)
        val i2 = inlineFns(i, depth)
        VplInterp.constArgs(Seq(t2, i2)) match {
          case Some(Seq(tv, iv)) =>
            VplInterp.indexConst(tv, iv)
              .fold(VMethod(t2, "__index", Seq(i2)): VExpr)(VplInterp.toExpr)
          case _ => VMethod(t2, "__index", Seq(i2))
        }
      case VMethod(t, m, a) => VMethod(inlineFns(t, depth), m, a.map(inlineFns(_, depth)))
      case VIf(c, t, f)     => VIf(inlineFns(c, depth), inlineFns(t, depth), inlineFns(f, depth))
      case VList(items)     => VList(items.map(inlineFns(_, depth)))
      case VStruct(items)   => VStruct(items.map { case (n, x) => n -> inlineFns(x, depth) })
      case other            => other
    }
  }

  /** Declared VPL types per field name across every event decl —
    * consulted only by the `+` concat-vs-add decision, so a field is
    * "a string" only when every declaration agrees.
    */
  private lazy val declaredFieldTypes: Map[String, Set[String]] =
    program.events.flatMap(_.fields).groupBy(_._1)
      .map { case (n, fs) => n -> fs.map(_._2.stripSuffix("?")).toSet }

  /** Conservative static "is this expression a string?" — drives the
    * reference's polymorphic `+` (string/string concatenates,
    * evaluator.rs BinOp::Add). Only shapes that PROVABLY produce a
    * string return true; anything uncertain stays on the numeric
    * path, exactly as compiled before.
    */
  private def isStringExpr(e: VExpr): Boolean = e match {
    case VStr(_)                => true
    case VCall("str", _)        => true
    case VCall("upper" | "lower" | "trim" | "replace" | "join" |
        "to_string" | "uppercase" | "lowercase" | "type_of", _) => true
    case VMethod(_, "upper" | "lower" | "trim", _) => true
    case VRef(n) =>
      letVals.get(n).exists(isStringExpr) ||
        declaredFieldTypes.get(n).exists(ts => ts.nonEmpty && ts.forall(_ == "str"))
    case VField(_, f) =>
      declaredFieldTypes.get(f).exists(ts => ts.nonEmpty && ts.forall(_ == "str"))
    case VIf(_, a, b)     => isStringExpr(a) || isStringExpr(b)
    case VBin("??", a, b) => isStringExpr(a) || isStringExpr(b)
    case VBin("+", a, b)  => isStringExpr(a) || isStringExpr(b)
    case _                => false
  }

  private def substitute(e: VExpr, sub: Map[String, VExpr]): VExpr = e match {
    case VRef(n) if sub.contains(n) => sub(n)
    case VBin(op, l, r)   => VBin(op, substitute(l, sub), substitute(r, sub))
    case VUn(op, x)       => VUn(op, substitute(x, sub))
    case VCall(n, args)   => VCall(n, args.map(substitute(_, sub)))
    case VMethod(t, m, a) => VMethod(substitute(t, sub), m, a.map(substitute(_, sub)))
    case VIf(c, t, f)     => VIf(substitute(c, sub), substitute(t, sub), substitute(f, sub))
    case VList(items)     => VList(items.map(substitute(_, sub)))
    case VStruct(items)   => VStruct(items.map { case (n, x) => n -> substitute(x, sub) })
    case other            => other
  }

  /** Per-event imperative fn call over event-field args → the
    * fuel-capped row-level interpreter fold ([[StmtFnCall]]).
    * Validated here so misuse fails at compile time with VPL-shaped
    * errors, never as an executor-side analysis failure.
    */
  private def stmtFnColumn(name: String, args: Seq[Column]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val fn = fns(name)
    if (fn.stmts.exists(_.isInstanceOf[SEmitStmt])) throw VplCompileError(
      s"fn $name: emit-bodied fns run through .process(), not in " +
        "expression position")
    if (fn.params.size != args.size) throw VplCompileError(
      s"fn $name: expected ${fn.params.size} args, got ${args.size}")
    val dt: org.apache.spark.sql.types.DataType =
      fn.ret.map(_.stripSuffix("?")) match {
        case Some("int")   => org.apache.spark.sql.types.LongType
        case Some("float") => org.apache.spark.sql.types.DoubleType
        case Some("str")   => org.apache.spark.sql.types.StringType
        case Some("bool")  => org.apache.spark.sql.types.BooleanType
        case Some(other) => throw VplCompileError(
          s"fn $name: per-event imperative calls return scalars " +
            s"(int|float|str|bool), declared -> $other")
        case None => throw VplCompileError(
          s"fn $name: a per-event imperative call needs a declared " +
            s"return type (`fn $name(...) -> int:`) — the row-level " +
            "fold cannot infer its column type from a dynamically-" +
            "typed body; constant-argument calls still evaluate at " +
            "compile time without one")
      }
    ColumnBridge.column(
      StmtFnCall(name, fns, dt, args.map(ColumnBridge.expression)))
  }

  private def translate(raw: VExpr, ctx: ExprCtx): Column = {
    val e = inlineFns(raw)
    // in-scope lambda parameters of the list HOFs (filter/map):
    // Spark's HOF builders invoke the Scala closure EAGERLY with the
    // named lambda-variable column, so a binding pushed around the
    // body translation is visible exactly while the body compiles
    val lambdaBindings = scala.collection.mutable.Map.empty[String, Column]
    def withBound(ps: Seq[(String, Column)])(body: => Column): Column = {
      // restore (not remove) shadowed bindings on exit, so a nested
      // lambda reusing an outer parameter name doesn't strip the outer
      // binding when it finishes compiling
      val shadowed = ps.map { case (p, _) => p -> lambdaBindings.get(p) }
      ps.foreach { case (p, c) => lambdaBindings(p) = c }
      try body finally shadowed.foreach {
        case (p, Some(prev)) => lambdaBindings(p) = prev
        case (p, None)       => lambdaBindings.remove(p)
      }
    }
    def t(e: VExpr): Column = e match {
      case VInt(v)  => lit(v)
      case VNum(v)  => lit(v)
      case VStr(v)  => lit(v)
      case VBool(v) => lit(v)
      case VNull    => lit(null)
      case VDur(us) => lit(us)
      case VRef(n) =>
        lambdaBindings.get(n)
          .orElse(ctx.bare(n))
          .orElse(letVals.get(n).map(t))
          // unknown field → NULL (reference dynamic-payload semantics)
          .getOrElse(lit(null))
      case VField(q, f) =>
        ctx.qualified(q, f)
          .orElse(ctx.bare(q).map(c => c.getField(f)))
          .getOrElse(throw VplCompileError(s"unresolvable reference $q.$f"))
      case VUn("-", x)   => -t(x)
      case VUn("not", x) => !t(x)
      case VUn("~", x)   => bitwise_not(t(x))
      case VUn(op, _)    => throw VplCompileError(s"unsupported unary '$op'")
      case VBin(op, l, r) => op match {
        case "and" => t(l) && t(r)
        case "or"  => t(l) || t(r)
        case "=="  => t(l) === t(r)
        case "!="  => t(l) =!= t(r)
        case "<"   => t(l) < t(r)
        case "<="  => t(l) <= t(r)
        case ">"   => t(l) > t(r)
        case ">="  => t(l) >= t(r)
        // `+` concatenates when a side is provably a string
        // (evaluator.rs BinOp::Add Str/Str arm); numeric otherwise.
        // Static inference keeps the numeric path untouched —
        // decimal/long/double additions compile exactly as before.
        case "+" if isStringExpr(l) || isStringExpr(r) =>
          concat(t(l).cast("string"), t(r).cast("string"))
        case "+"   => t(l) + t(r)
        case "-"   => t(l) - t(r)
        case "*"   => t(l) * t(r)
        case "/"   => t(l) / t(r)
        case "%"   => t(l) % t(r)
        case "**"  => pow(t(l), t(r))
        case "??"  => coalesce(t(l), t(r))
        case "&"   => t(l).bitwiseAND(t(r))
        case "|"   => t(l).bitwiseOR(t(r))
        case "^"   => t(l).bitwiseXOR(t(r))
        case "<<"  => call_function("shiftleft", t(l), t(r))
        case ">>"  => call_function("shiftright", t(l), t(r))
        case "in"     => membership(l, r, t)
        case "not in" => !membership(l, r, t)
        case other => throw VplCompileError(s"unsupported operator '$other'")
      }
      case VIf(c, th, el) => when(t(c), t(th)).otherwise(t(el))
      // `a..b` / `a..=b` as a VALUE materializes the int array the
      // reference's Expr::Range builds (guarded: Spark's sequence()
      // would happily count DOWN for an empty range like 5..2)
      case VCall("__range", Seq(a, b, VBool(incl))) =>
        val s = t(a).cast("long")
        val e0 = if (incl) t(b).cast("long") else t(b).cast("long") - 1
        when(s <= e0, sequence(s, e0))
          .otherwise(slice(sequence(lit(0L), lit(0L)), 1, 0))
      // list HOFs with lambda arguments (evaluator.rs "filter"/"map";
      // 2-param lambdas destructure the pair arrays sliding_pairs
      // emits). Dispatched before the scalar builtin table because
      // the lambda body compiles under its parameter binding.
      case VCall("filter", Seq(arrE, VLambda(Seq(p), body))) =>
        filter(t(arrE), x => withBound(Seq(p -> x))(t(body)))
      case VCall("map", Seq(arrE, VLambda(Seq(p), body))) =>
        transform(t(arrE), x => withBound(Seq(p -> x))(t(body)))
      case VCall("map", Seq(arrE, VLambda(Seq(p1, p2), body))) =>
        transform(t(arrE), x => withBound(Seq(
          p1 -> element_at(x, 1), p2 -> element_at(x, 2)))(t(body)))
      // imperative statement-fn call whose args survived const
      // folding → event-field args: the per-row fuel-capped
      // interpreter fold (the reference evaluates the same body per
      // event through its engine evaluator)
      case VCall(fn0, args) if fns.contains(fn0) && fns(fn0).stmts.nonEmpty =>
        stmtFnColumn(fn0, args.map(t))
      // analytic window builtins (builtins.md Window Functions): the
      // reference's LSP/docs name them but varpulis-runtime has no
      // evaluator arm — graft compiles them to real Spark window
      // functions over (partition_by keys, arrival order)
      case VCall(fn @ ("lag" | "lead" | "row_number" | "rank"), args0) =>
        import org.apache.spark.sql.expressions.Window
        val (keys, ord) = ctx.analytic.getOrElse(throw VplCompileError(
          s"$fn(): analytic window functions run in a BATCH stream " +
            "pipeline's select/emit (after .partition_by); streaming, " +
            "sequence and join contexts have no single arrival order " +
            "to window over"))
        lazy val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord))
        (fn, args0) match {
          case ("row_number", Nil) => row_number().over(w).cast("long")
          case ("rank", scala.Seq(x)) =>
            // rank needs a VALUE ordering: over arrival order (unique)
            // it would always equal row_number(), so the ranking
            // expression is explicit — ties share a rank
            rank().over(Window.partitionBy(keys.map(col): _*)
              .orderBy(t(x))).cast("long")
          case ("rank", Nil) => throw VplCompileError(
            "rank(expr): pass the ranking expression — over the unique " +
              "arrival order rank() would always equal row_number()")
          case ("lag", scala.Seq(x))           => lag(t(x), 1).over(w)
          case ("lag", scala.Seq(x, VInt(n)))  => lag(t(x), n.toInt).over(w)
          case ("lead", scala.Seq(x))          => lead(t(x), 1).over(w)
          case ("lead", scala.Seq(x, VInt(n))) => lead(t(x), n.toInt).over(w)
          case _ => throw VplCompileError(
            s"unsupported analytic '$fn/${args0.size}' " +
              "(lag(x[, n]) | lead(x[, n]) | row_number() | rank(x))")
        }
      case VCall(fn, args) => builtin(fn, args.map(t))
      case VMethod(target, "__index", Seq(i)) =>
        poly(graft.functions.PolyIndex(_, _), t(target), t(i))
      case VMethod(target, "__slice", Seq(s0, e0)) =>
        val lo = if (s0 == VNull) lit(null).cast("long") else t(s0)
        val hi = if (e0 == VNull) lit(null).cast("long") else t(e0)
        import org.apache.spark.sql.graftbridge.ColumnBridge
        ColumnBridge.column(graft.functions.PolySlice(
          ColumnBridge.expression(t(target)),
          ColumnBridge.expression(lo), ColumnBridge.expression(hi)))
      case VMethod(target, m, args) => (m, args) match {
        case ("len", Nil)   => length(t(target))
        case ("upper", Nil) => upper(t(target))
        case ("lower", Nil) => lower(t(target))
        case ("abs", Nil)   => abs(t(target))
        // `.field` member access on a struct-valued expression
        // (struct literals, nested emit payloads; also the `?.` form
        // — getField null-propagates). Analysis rejects non-struct
        // targets with a clear "no such field" error.
        case (field, Nil)   => t(target).getField(field)
        case _ => throw VplCompileError(s"unsupported method '.$m(${args.size} args)'")
      }
      case VStruct(items) =>
        struct(items.map { case (n, x) => t(x).as(n) }: _*)
      // list literal as a VALUE (evaluator.rs Value::Array) — `in`
      // membership intercepts its own VList before reaching here
      case VList(items)  => array(items.map(t): _*)
      case VLambda(_, _) => throw VplCompileError("lambda outside .pattern()")
    }
    t(e)
  }

  /** `l in r` (BinOp::In / NotIn): literal lists stay `isin`
    * (codegen'd); ranges compile to BOUNDS CHECKS, not a materialized
    * array — `x in 0..1_000_000_000` must not build 1e9 elements per
    * row at scale (int semantics, as the reference's ranges are);
    * string literals are substring containment; any other container
    * expression dispatches on its analyzed type ([[graft.functions.PolyIn]]:
    * array membership / map key / substring).
    */
  private def membership(l: VExpr, r: VExpr, t: VExpr => Column): Column = r match {
    case VList(items) => t(l).isin(items.map(litOf): _*)
    case VCall("__range", Seq(a, b, VBool(incl))) =>
      val x = t(l)
      x >= t(a) && (if (incl) x <= t(b) else x < t(b))
    case VStr(s) => lit(s).contains(t(l))
    case other => poly(graft.functions.PolyIn(_, _), t(l), t(other))
  }

  private def poly(
      mk: (org.apache.spark.sql.catalyst.expressions.Expression,
           org.apache.spark.sql.catalyst.expressions.Expression) =>
          org.apache.spark.sql.catalyst.expressions.Expression,
      a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(mk(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  private def litOf(e: VExpr): Any = e match {
    case VInt(v)  => v
    case VNum(v)  => v
    case VStr(v)  => v
    case VBool(v) => v
    case _        => throw VplCompileError("expected a literal")
  }

  private def builtin(fn: String, args: Seq[Column]): Column = (fn, args) match {
    case ("abs", Seq(x))       => abs(x)
    // polymorphic len: string chars OR array/map elements (PolyLen)
    case ("len" | "length", Seq(x)) =>
      import org.apache.spark.sql.graftbridge.ColumnBridge
      ColumnBridge.column(
        graft.functions.PolyLen(ColumnBridge.expression(x)))
    case ("upper", Seq(x))     => upper(x)
    case ("lower", Seq(x))     => lower(x)
    case ("round", Seq(x))     => round(x)
    case ("round", Seq(x, n))  => call_function("round", x, n)
    case ("floor", Seq(x))     => floor(x)
    case ("ceil", Seq(x))      => ceil(x)
    case ("sqrt", Seq(x))      => sqrt(x)
    case ("pow", Seq(x, y))    => pow(x, y)
    case ("log", Seq(x))       => log(x)
    case ("exp", Seq(x))       => exp(x)
    case ("min", xs) if xs.size >= 2 => least(xs: _*)
    case ("max", xs) if xs.size >= 2 => greatest(xs: _*)
    case ("coalesce", xs)      => coalesce(xs: _*)
    // strings (builtins.md String Functions; literal-replace and
    // regex-match exactly as documented)
    case ("trim", Seq(x))           => trim(x)
    case ("contains", Seq(s2, sub)) => call_function("contains", s2, sub)
    case ("starts_with", Seq(s2, p)) => call_function("startswith", s2, p)
    case ("ends_with", Seq(s2, p))  => call_function("endswith", s2, p)
    case ("split", Seq(s2, sep))    => call_function("split", s2, sep)
    case ("join", Seq(arr, sep))    => call_function("concat_ws", sep, arr)
    case ("replace", Seq(s2, a, b)) => call_function("replace", s2, a, b)
    case ("regex_match", Seq(s2, p)) => call_function("rlike", s2, p)
    // timestamps (UTC session)
    case ("now", Nil)          => current_timestamp()
    case ("year", Seq(ts))     => year(ts)
    case ("month", Seq(ts))    => month(ts)
    case ("day", Seq(ts))      => dayofmonth(ts)
    case ("hour", Seq(ts))     => hour(ts)
    case ("minute", Seq(ts))   => minute(ts)
    case ("second", Seq(ts))   => second(ts)
    case ("duration_between", Seq(a, b)) => unix_micros(b) - unix_micros(a)
    // explicit type conversions (docs/language/types.md §Type
    // Conversions; evaluator.rs to_int/to_float/to_string aliases).
    // Spark casts parse-or-null, which is exactly try_int's
    // documented contract; int()/float() share it (the reference
    // errors on a bad parse — a per-row throw has no place in a
    // vectorized plan, so bad input converts to null).
    case ("int" | "try_int" | "to_int", Seq(x)) =>
      x.cast(org.apache.spark.sql.types.LongType)
    case ("float" | "to_float", Seq(x)) =>
      x.cast(org.apache.spark.sql.types.DoubleType)
    case ("str" | "to_string", Seq(x)) =>
      x.cast(org.apache.spark.sql.types.StringType)
    // the rest of the evaluator.rs scalar surface
    case ("sin", Seq(x))   => sin(x)
    case ("cos", Seq(x))   => cos(x)
    case ("tan", Seq(x))   => tan(x)
    case ("log10", Seq(x)) => log10(x)
    case ("lowercase", Seq(x)) => lower(x)
    case ("uppercase", Seq(x)) => upper(x)
    // type predicates (evaluator.rs is_*/type_of): `typeof` is
    // schema-derived, so these constant-fold at analysis
    case ("is_null", Seq(x))   => isnull(x)
    case ("is_int", Seq(x)) =>
      call_function("typeof", x)
        .isin("tinyint", "smallint", "int", "bigint")
    case ("is_float", Seq(x)) =>
      call_function("typeof", x).isin("float", "double") ||
        call_function("typeof", x).startsWith("decimal")
    case ("is_string", Seq(x)) => call_function("typeof", x) === "string"
    case ("is_bool", Seq(x))   => call_function("typeof", x) === "boolean"
    case ("is_array", Seq(x))  => call_function("typeof", x).startsWith("array")
    case ("is_map", Seq(x))    => call_function("typeof", x).startsWith("map")
    case ("type_of", Seq(x)) => {
      val t0 = call_function("typeof", x)
      when(t0.isin("tinyint", "smallint", "int", "bigint"), "int")
        .when(t0.isin("float", "double") || t0.startsWith("decimal"), "float")
        .when(t0 === "string", "str")
        .when(t0 === "boolean", "bool")
        .when(t0 === "timestamp", "timestamp")
        .when(t0.startsWith("array"), "list")
        .when(t0.startsWith("map"), "map")
        .otherwise(t0)
    }
    // list functions (evaluator.rs array surface). Single-arg min/max/
    // sum/avg/count never collide with the aggregate compiler: VCall
    // aggregates are consumed by the window/agg paths before scalar
    // translation, and the 2+-arg scalar min/max keep their own arm.
    case ("sort", Seq(x))    => array_sort(x)
    case ("reverse", Seq(x)) => reverse(x)
    case ("flatten", Seq(x)) => flatten(x)
    case ("first", Seq(x))   => element_at(x, 1)
    case ("last", Seq(x))    => element_at(x, -1)
    case ("pop", Seq(x)) =>
      slice(x, lit(1), greatest(size(x) - 1, lit(0)))
    case ("keys", Seq(x))    => map_keys(x)
    case ("values", Seq(x))  => map_values(x)
    case ("min", Seq(x))     => array_min(x)
    case ("max", Seq(x))     => array_max(x)
    case ("count", Seq(x))   => size(x).cast("long")
    case ("sum", Seq(x)) =>
      aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double"))
    case ("avg", Seq(x)) =>
      aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double")) /
        size(x).cast("double")
    // consecutive-pair fan-out (evaluator.rs sliding_pairs):
    // [a,b,c] -> [[a,b],[b,c]] via one zip of the array with its
    // shifted self — no index lambda (interpreted-HOF pitfall)
    case ("sliding_pairs", Seq(x)) =>
      zip_with(
        slice(x, lit(1), greatest(size(x) - 1, lit(0))),
        slice(x, lit(2), greatest(size(x) - 1, lit(0))),
        (a, b) => array(a, b))
    // utility
    case ("uuid", Nil)         => expr("uuid()")
    case ("random", Nil)       => rand()
    case _ => throw VplCompileError(s"unsupported function '$fn/${args.size}'")
  }

  private val aggFnNames = Set("count", "sum", "avg", "min", "max",
    "stddev", "variance", "first", "last", "collect", "count_distinct",
    "ema", "median", "percentile")

  private def isAggCall(e: VExpr): Boolean = e match {
    case VCall("count", as)      => as.size <= 1
    case VCall("percentile", as) => as.size == 2
    case VCall("ema", as)        => as.size == 2
    // min/max with 2+ args are the scalar least/greatest builtins
    case VCall(fn, Seq(_))       => aggFnNames(fn)
    case _                       => false
  }

  /** Does the (fn-inlined) expression contain an aggregate call? */
  private def containsAgg(e: VExpr): Boolean =
    isAggCall(e) || (e match {
      case VBin(_, l, r)     => containsAgg(l) || containsAgg(r)
      case VUn(_, x)         => containsAgg(x)
      case VCall(_, as)      => as.exists(containsAgg)
      case VMethod(t, _, as) => containsAgg(t) || as.exists(containsAgg)
      case VIf(c, a, b)      => containsAgg(c) || containsAgg(a) || containsAgg(b)
      case VList(is)         => is.exists(containsAgg)
      case VStruct(is)       => is.exists(i => containsAgg(i._2))
      case _                 => false
    })

  // ------------------------------------------------------------ aggregates
  /** Aggregate calls — DECIMAL-exact sums (hash parity with DuckDB,
    * see QueryDef scaladoc), native everything.
    */
  private def aggColumn(e: VExpr, ctx0: ExprCtx,
      orderCol: String = "event_id"): Column = {
    // window functions cannot nest inside aggregates: unset the
    // analytic context so lag/lead/row_number/rank written in
    // .aggregate() raise the pointed VplCompileError instead of a raw
    // Spark AnalysisException
    val ctx = ctx0.copy(analytic = None)
    inlineFns(e) match {
    case VCall("count", Nil)      => count(lit(1))
    // alternative syntax from the 0.2.0 changelog: count(distinct(f))
    // dispatches to the same aggregate as count_distinct(f)
    case VCall("count", Seq(VCall("distinct", Seq(x)))) =>
      count_distinct(translate(x, ctx))
    case VCall("count", Seq(x))   => count(translate(x, ctx))
    case VCall("sum", Seq(x)) =>
      sum(translate(x, ctx).cast("decimal(14,2)")).cast("double")
    case VCall("avg", Seq(x))     => avg(translate(x, ctx))
    case VCall("min", Seq(x))     => min(translate(x, ctx))
    case VCall("max", Seq(x))     => max(translate(x, ctx))
    case VCall("stddev", Seq(x))  => stddev_samp(translate(x, ctx))
    case VCall("variance", Seq(x)) => var_samp(translate(x, ctx))
    case VCall("first", Seq(x))   => min_by(translate(x, ctx), col(orderCol))
    case VCall("last", Seq(x))    => max_by(translate(x, ctx), col(orderCol))
    case VCall("collect", Seq(x)) => collect_list(translate(x, ctx))
    case VCall("count_distinct", Seq(x)) => count_distinct(translate(x, ctx))
    case VCall("median", Seq(x)) =>
      expr_percentile(translate(x, ctx), 0.5)
    case VCall("percentile", Seq(x, VNum(p))) =>
      expr_percentile(translate(x, ctx), p)
    case other => throw VplCompileError(s"unsupported aggregate: $other")
    }
  }

  private def expr_percentile(c: Column, p: Double): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions
      .aggregate.Percentile(ColumnBridge.expression(c.cast("double")),
        org.apache.spark.sql.catalyst.expressions.Literal(p))
      .toAggregateExpression())
  }

  private def windowSpec(op: OpWindow): WindowSpec = {
    val named = op.named.toMap
    named.get("session") match {
      case Some(VDur(us)) => SessionWin(durStr(us))
      case Some(_)        => throw VplCompileError("session: expects a duration")
      case None => op.positional match {
        case Seq(VDur(us)) => named.get("sliding") match {
          case Some(VDur(s)) => Sliding(durStr(us), durStr(s))
          case _             => Tumbling(durStr(us))
        }
        case Seq(VInt(n)) => named.get("sliding") match {
          case Some(VInt(s)) => SlidingCountWin(n.toInt, s.toInt)
          case _             => CountWin(n.toInt)
        }
        case other => throw VplCompileError(s"unsupported window args: $other")
      }
    }
  }

  private def durStr(us: Long): String =
    if (us % 1000000L == 0) s"${us / 1000000L} seconds"
    else s"${us / 1000L} milliseconds"

  // ------------------------------------------------------------ streams
  private def compileStream(s: VStream): DataFrame = {
    var headAlias: Option[String] = None
    // join(S1, S2, ...) source: inputs compiled and column-prefixed,
    // joined when `.on` provides the condition
    var joinInputs: Option[Seq[(String, DataFrame)]] = None
    var joinWinUs: Option[Long] = None
    // batch `stream X = PatternName...`: the declared pattern compiles
    // to its join realization and step aliases resolve against the
    // prefixed columns (the reference stores pattern refs as a future
    // feature — here they execute)
    var patternCtx: Option[ExprCtx] = None
    // batch stream sourced from a Kleene pattern decl (A -> B+/B* -> C):
    // compiled at emit via Pattern.kleeneBetween so the MAXIMAL-RUN
    // row shape matches the streaming NFA (one row per anchor pair,
    // len/sum/first over the run) — compilePattern's enumeration
    // semantics stay available for direct detection-mode calls
    var batchKleeneDecl: Option[VPatternDecl] = None
    var df: DataFrame = s.source match {
      case SrcTimer(periodUs, delayUs) =>
        // Periodic tick source (10_timer_source.vpl). The reference
        // fires on wall clock; the deterministic batch realization
        // generates event-time ticks spanning the staged data's
        // [min ts + delay, max ts] at the period — one sequence()
        // explode, no driver loop. `timestamp` (the reference's
        // fire-time builtin) rides as a column.
        if (streaming) throw VplCompileError(
          "timer sources are batch-only (streaming would bind the rate connector)")
        // guard like the __range arm: an initial_delay past the staged
        // span means zero ticks, not sequence()'s illegal-boundaries
        // runtime error
        source.allEvents
          .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
          .select(explode(when(
            col("t0") + expr(s"interval $delayUs microsecond") <= col("t1"),
            sequence(
              col("t0") + expr(s"interval $delayUs microsecond"),
              col("t1"),
              expr(s"interval $periodUs microsecond")))
            .otherwise(array().cast("array<timestamp>"))).as("ts"))
          .withColumn("event_id", unix_micros(col("ts")))
          .withColumn("timestamp", col("ts"))
      case SrcMerge(names) =>
        // heterogeneous alert streams merge with NULL-filled gaps
        // (hvac_demo AllAlerts)
        names.map(resolveAny)
          .reduce(_.unionByName(_, allowMissingColumns = true))
      case SrcJoin(names) =>
        val ins = names.map(n => n -> prefixed(resolveAny(n), n))
        joinInputs = Some(ins)
        ins.head._2 // placeholder until OpOn builds the join
      case SrcName(n, alias) if s.ops.exists {
          case OpFrom(c, _) => sourceConns.contains(c)
          case _            => false
        } =>
        // head stream bound to a REAL connector: read its landing dir
        // under the declared schema (see sourceConns scaladoc)
        headAlias = alias
        val (conn0, ps) = s.ops.collectFirst {
          case OpFrom(c, p) if sourceConns.contains(c) =>
            (sourceConns(c), p)
        }.get
        boundSource(conn0, ps, n)
      case SrcName(n, alias) =>
        headAlias = alias
        if (!streaming && program.streams.forall(_.name != n) &&
          program.patterns.exists(_.name == n) &&
          (program.patterns.find(_.name == n).get.expr match {
            case SaseSeq(items) => items.forall(!_.negated) &&
              items.size == 3 && items(1).kleene.exists(k => k == "+" || k == "*") &&
              items(0).kleene.isEmpty && items(2).kleene.isEmpty
            case _ => false
          })) {
          // A -> B+/B* -> C pattern decl as a batch stream source:
          // defer to the emit-time maximal-run compile below
          batchKleeneDecl = program.patterns.find(_.name == n)
          resolveAny(program.patterns.find(_.name == n).get.expr
            .asInstanceOf[SaseSeq].items.head.eventType) // placeholder
        } else if (!streaming && program.streams.forall(_.name != n) &&
          program.patterns.exists(_.name == n)) {
          val pdf = compilePattern(n)
          val pcols = pdf.columns.toSeq
          patternCtx = Some(ExprCtx(
            bare = f => pcols.reverse.collectFirst {
              case c if c.endsWith(s"__$f") => col(c)
            }.orElse(if (pcols.contains(f)) Some(col(f)) else None),
            qualified = (q, f) =>
              if (pcols.contains(s"${q}__$f")) Some(col(s"${q}__$f"))
              // known step alias, field the event doesn't carry → NULL
              else if (pcols.exists(_.startsWith(s"${q}__"))) Some(lit(null))
              else None))
          pdf
        } else resolveAny(n)
    }
    // Dynamic payload: an undeclared event type absent from the data
    // resolves with only the raw `fields` map (reference events are
    // schemaless until bound). Materialize every field name the
    // stream's ops reference, so partition keys and expressions
    // resolve as real columns; unreferenced payload stays unread.
    // Applies to the head AND to every `->` step / trend side bound
    // later (dynamicize).
    // name → needs a NUMERIC column (appears under arithmetic, where
    // ANSI Spark rejects strings); everything else stays the payload's
    // string truth (keys, equality, ordering)
    lazy val dynRefNames: Map[String, Boolean] = {
      val ref = mutable.Map.empty[String, Boolean]
      def add(n: String, arith: Boolean): Unit =
        ref(n) = ref.getOrElse(n, false) || arith
      val arithOps = Set("+", "-", "*", "/", "%")
      val arithFns = Set("abs", "sqrt", "pow", "round", "floor", "ceil",
        "exp", "ln", "log", "min", "max", "sum", "avg", "stddev",
        "variance", "ema", "median", "percentile")
      def walkE(e: VExpr, arith: Boolean): Unit = e match {
        case VRef(n)           => add(n, arith)
        case VField(_, f)      => add(f, arith)
        case VBin(op, l, r) =>
          val a2 = arith || arithOps(op)
          walkE(l, a2); walkE(r, a2)
        case VUn(op, x)        => walkE(x, arith || op == "-")
        case VCall(f, as)      => as.foreach(walkE(_, arith || arithFns(f)))
        case VMethod(t, _, as) => walkE(t, arith); as.foreach(walkE(_, arith))
        case VIf(c, a, b)      => walkE(c, false); walkE(a, arith); walkE(b, arith)
        case VList(is)         => is.foreach(walkE(_, arith))
        case VStruct(is)       => is.foreach(i => walkE(i._2, arith))
        case _                 => ()
      }
      s.ops.foreach {
        case OpPartitionBy(cs)   => cs.foreach(add(_, arith = false))
        case OpDistinct(cs)      => cs.foreach(add(_, arith = false))
        case OpWhere(e)          => walkE(e, arith = false)
        case OpHaving(e)         => walkE(e, arith = false)
        case OpSelect(items)     =>
          items.foreach { case (n, eo) =>
            eo.fold[Unit](add(n, arith = false))(walkE(_, arith = false)) }
        case OpAggregate(aggs)   => aggs.foreach(i => walkE(i._2, arith = false))
        case OpEmit(args, _)     => args.foreach(i => walkE(i._2, arith = false))
        case OpOrderBy(items)    => items.foreach(i => walkE(i._1, arith = false))
        case OpFollowedBy(step)  => step.where.foreach(walkE(_, arith = false))
        case OpNot(step)         => step.where.foreach(walkE(_, arith = false))
        case _                   => ()
      }
      ref.toMap
    }
    def dynamicize(d: DataFrame): DataFrame =
      if (d.columns.contains("fields") && d.columns.length <= 3) {
        val missing = (dynRefNames -- d.columns.toSet - "ts" - "event_id")
          .toSeq.sortBy(_._1)
        val widened =
          if (missing.isEmpty) d
          else d.select(d.columns.map(col).toSeq ++
            missing.map { case (f, arith) =>
              val raw = element_at(col("fields"), f)
              (if (arith) raw.cast("double") else raw).as(f)
            }: _*)
        widened.drop("fields")
      } else d
    df = dynamicize(df)
    // streaming: the source is unfiltered (sentinel must reach the
    // watermark node) — the event-type filter applies after .watermark
    var pendingType: Option[String] = s.source match {
      case SrcName(n, _) if streaming && program.streams.forall(_.name != n) =>
        Some(n)
      case _ => None
    }
    var watermarked = false
    var wmDelayUs: Option[Long] = None
    // streaming sequence accumulation: (eventType, alias, where, kleene)
    var streamSeq: Option[mutable.Buffer[(String, String, Option[VExpr], Option[String])]] = None
    var streamSeqWithinUs: Option[Long] = None
    // correlation keys fixed by a declared pattern's `partition by`
    // (step-predicate key equalities merge into / refine these)
    var streamSeqKeys: Seq[String] = Nil
    val streamSeqNegs = mutable.Buffer.empty[SeqStep]
    // streaming `.forecast`: the truncated final step's alias (emit
    // refs → NULL) and the pre-fit model annotations applied to the
    // match stream (model fitting is batch work over the staged
    // events — training state, not streaming output; the annotation
    // itself runs per micro-batch)
    var streamGhost: Option[String] = None
    var streamForecastCols: Seq[(String, Column)] = Nil
    var streamForecastMinProb: Option[Double] = None
    var streamForecastHorizonUs: Long = 3600000000L
    // a declared `pattern Name = SEQ(...)` used as a STREAM SOURCE
    // compiles through the generic streaming NFA — Kleene items and
    // cross-step predicates included (sase.rs executes these shapes
    // live; batch mode keeps the compilePattern join subset)
    s.source match {
      case SrcName(n, _) if streaming && program.streams.forall(_.name != n) =>
        program.patterns.find(_.name == n).foreach { decl =>
          decl.expr match {
            case SaseSeq(items) =>
              val b = mutable.Buffer.empty[(String, String, Option[VExpr], Option[String])]
              items.zipWithIndex.foreach { case (it, i) =>
                if (it.negated)
                  streamSeqNegs += SeqStep(it.eventType, it.alias, it.where,
                    matchAll = false)
                else b += ((it.eventType, it.alias.getOrElse(s"s$i"),
                  it.where, it.kleene))
              }
              streamSeq = Some(b)
              streamSeqWithinUs = decl.withinUs
              streamSeqKeys = decl.partitionBy.toSeq
              pendingType = None
            case other =>
              // OR / single filtered ref: stateless on a live stream —
              // a per-type filtered union (heterogeneous fields
              // NULL-fill, like the batch compilePattern OR branch)
              def items(e: SaseExpr): Seq[SaseItem] = e match {
                case SaseOr(l, r) => items(l) ++ items(r)
                case SaseRef(it) if !it.negated && it.kleene.isEmpty => Seq(it)
                case o => throw VplCompileError(
                  s"streaming pattern '$n': unsupported combinator $o")
              }
              val ses = source match {
                case x: StreamingEvtSource => x
                case _ => throw VplCompileError(
                  "streaming patterns need a StreamingEvtSource")
              }
              df = items(other).map { it =>
                val d = ses.resolve(it.eventType)
                val cols = d.columns.toSet
                val ctx = ExprCtx(
                  bare = f => if (cols(f)) Some(col(f)) else None,
                  qualified = (_, _) => None)
                val typed = d.filter(col("event_type") === it.eventType ||
                  col("event_type") === "__sentinel")
                it.where.map(w => typed.filter(translate(w, ctx) ||
                  col("event_type") === "__sentinel")).getOrElse(typed)
              }.reduce(_.unionByName(_, allowMissingColumns = true))
              pendingType = None
          }
        }
      case _ => ()
    }
    def settleType(): Unit = pendingType.foreach { t =>
      if (streaming)
        // the end-of-stream sentinel must keep flowing (pushdown puts
        // this filter below the EventTimeWatermark node, so dropping
        // it would freeze the watermark and append-mode windows would
        // never close). It parks in its own far-future window, which
        // never finalizes — so it can never appear in aggregate
        // output; stateless emits strip it explicitly.
        df = df.filter(col("event_type") === t ||
          col("event_type") === "__sentinel")
      else
        df = df.filter(col("event_type") === t).drop("event_type")
      pendingType = None
    }
    var seq: Option[SeqState] = None
    var seqMaterialized = false
    var keys: Seq[String] = Nil
    var win: Option[WindowSpec] = None
    var aggregated = false
    var finished = false
    // columns attached mid-pipeline (forecast_* builtins) that the
    // step-scoped sequence context doesn't know about
    var extraCols: Set[String] = Set.empty
    // windowed `.where(first(x) < last(y))` with no explicit
    // .aggregate (financial_markets GoldenCross) — deferred until emit
    val pendingAggWhere = mutable.Buffer.empty[VExpr]

    def ctx: ExprCtx = {
      val base = (seq, joinInputs) match {
        case (Some(st), _)   => seqCtx(st)
        case (None, Some(i)) => joinCtx(i)
        case _ => patternCtx.getOrElse(scalarCtx(df, headAlias))
      }
      val withExtra =
        if (extraCols.isEmpty) base
        else ExprCtx(
          bare = f => base.bare(f)
            .orElse(if (extraCols(f)) Some(col(f)) else None),
          qualified = base.qualified)
      // analytic builtins (lag/lead/row_number/rank — builtins.md
      // Window Functions; the reference documents them but its runtime
      // has NO implementation, so the semantics here are the w7 DSL
      // precedent: partitioned by .partition_by, ordered by arrival).
      // Batch scalar pipelines only — Spark has no streaming window
      // functions and sequence/join contexts have no single arrival
      // order.
      val ord =
        if (df.columns.contains("event_id")) Some("event_id")
        else if (df.columns.contains("ts")) Some("ts")
        else None
      if (!streaming && seq.isEmpty && joinInputs.isEmpty && ord.isDefined)
        withExtra.copy(analytic = Some((keys, ord.get)))
      else withExtra
    }

    // `.window(d)` over a join without aggregation = the stream-join
    // proximity bound: all sides share one tumbling bucket (reference
    // join.rs windowed correlation). Applied once, before projection.
    def applyJoinWindow(): Unit = (joinInputs, joinWinUs) match {
      case (Some(ins), Some(us)) if !aggregated =>
        val tsCols = ins.collect {
          case (n, d) if d.columns.contains(s"${n}__ts") => col(s"${n}__ts")
        }
        if (tsCols.size >= 2) {
          val cond = tsCols.map(c => floor(unix_micros(c) / lit(us)))
            .sliding(2).map { case Seq(a, b) => a === b }.reduce(_ && _)
          df = df.filter(cond)
        }
        joinWinUs = None
      case _ => ()
    }

    /** Windowed/keyed aggregation of `items` (name → expr). Pure agg
      * calls aggregate directly; compound expressions (`last(x) −
      * ema(x, 9)`, MACDSignal) compute their agg leaves under temp
      * names and re-combine scalar after; ema folds (order, value)
      * pairs collected with a frame-compatible agg. Outputs named
      * like a partition key (`symbol: last(symbol)`) or the order
      * column replace those columns instead of duplicating them.
      */
    def runAgg(items: Seq[(String, VExpr)]): Unit = {
      // a streaming windowed aggregate with no declared .watermark
      // gets the reference's default: zero out-of-order tolerance
      if (streaming && !watermarked) {
        df = df.withWatermark("ts", "0 seconds")
        watermarked = true
      }
      settleType()
      val c = ctx
      // derived streams (aggregates of aggregates, financial_markets
      // RSI) no longer carry event_id — order by arrival proxy
      val ord =
        if (df.columns.contains("event_id")) "event_id"
        else if (df.columns.contains("ts")) "ts"
        else throw VplCompileError(
          "aggregate needs an event_id or ts column for ordering")
      def collides(n: String) = keys.contains(n) || n == ord
      val renamed = items.map { case (n, e) =>
        (if (collides(n)) s"__agg_$n" else n) -> inlineFns(e)
      }
      // Streaming count windows: the window id is a per-key event
      // COUNTER — not expressible as a time-window groupBy (batch uses
      // row_number, which streams cannot). Route through the generic
      // flatMapGroupsWithState count-window aggregator; its stable
      // state class checkpoints, so a restarted query resumes
      // mid-window (reference checkpoint_count_window scenario).
      win match {
        case Some(graft.dsl.CountWin(nWin)) if streaming =>
          import org.apache.spark.sql.functions._
          val sp = df.sparkSession
          import sp.implicits._
          val args = scala.collection.mutable.Buffer.empty[VExpr]
          val kinds = renamed.map {
            case (_, VCall("count", Nil)) => ("count", -1)
            case (_, VCall(f @ ("sum" | "avg" | "min" | "max"), Seq(x))) =>
              args += x; (f, args.size - 1)
            case (nm, other) => throw VplCompileError(
              s"streaming count windows support count/sum/avg/min/max only; '$nm' is $other")
          }
          if (ord != "event_id") throw VplCompileError(
            "streaming count windows need an event_id column for deterministic order")
          val keyCol =
            if (keys.isEmpty) lit("")
            else concat_ws("", keys.map(kn => col(kn).cast("string")): _*)
          val keyTypes = keys.map(kn => kn -> df.schema(kn).dataType)
          // The sentinel must pass the WATERMARK node: a Column filter
          // here would be pushed below it into the scan (the r5
          // watermark-pin hazard) and the watermark would never
          // advance. Mark it dead in a PROJECTION instead; the fold
          // skips dead rows. vals are null-coalesced because the
          // sentinel carries no fields.
          val liveCol =
            if (df.columns.contains("event_type"))
              col("event_type") =!= "__sentinel"
            else lit(true)
          val in = df.select(keyCol.as("key"),
            col(ord).cast("long").as("ord"),
            unix_micros(col("ts")).as("ts_us"),
            col("ts"),
            liveCol.as("live"),
            array(args.toSeq.map(e => coalesce(
              VplCompiler.this.translate(e, c).cast("double"), lit(0.0))): _*)
              .cast("array<double>").as("vals"))
            .as[graft.streaming.CountWindowStream.In]
          var out = graft.streaming.CountWindowStream
            .run(in, nWin, kinds)(sp).toDF()
          keyTypes.zipWithIndex.foreach { case ((kn, dt), i) =>
            out = out.withColumn(kn,
              split(col("key"), "").getItem(i).cast(dt))
          }
          renamed.zipWithIndex.foreach { case ((nm, _), i) =>
            val v = element_at(col("outs"), i + 1)
            out = out.withColumn(nm,
              if (kinds(i)._1 == "count") v.cast("long") else v)
          }
          df = out.select((keys.map(col) :+ col("win_id")) ++
            renamed.map { case (nm, _) => col(nm) }: _*)
          win = None
          return
        case Some(_: graft.dsl.SlidingCountWin) if streaming =>
          throw VplCompileError(
            "streaming sliding count windows are not supported")
        case _ => ()
      }
      val directB = mutable.Buffer.empty[(String, VExpr)]
      val postB = mutable.Buffer.empty[(String, VExpr)]
      renamed.foreach { case (n, e) =>
        if (isAggCall(e)) directB += (n -> e)
        else {
          def split(x: VExpr): VExpr = x match {
            case c2 if isAggCall(c2) =>
              val nm = s"__sub_${directB.size}"
              directB += (nm -> c2); VRef(nm)
            case VBin(op, l, r) => VBin(op, split(l), split(r))
            case VUn(op, y)     => VUn(op, split(y))
            case VCall(f, as)   => VCall(f, as.map(split))
            case VIf(cc, a, b)  => VIf(split(cc), split(a), split(b))
            case other          => other
          }
          postB += (n -> split(e))
        }
      }
      val emas = directB.collect {
        case (n, VCall("ema", Seq(x, VInt(p)))) => (n, x, p)
      }.toSeq
      val direct = directB.toSeq
        .filterNot(r => emas.exists(_._1 == r._1))
        .map { case (n, e) => n -> aggColumn(e, c, ord) }
      val collects = emas.map { case (n, x, _) =>
        s"__vals_$n" -> collect_list(struct(
          col(ord).as("o"), translate(x, c).cast("double").as("v")))
      }
      // Spark rejects GLOBAL streaming session windows ("Global
      // aggregation with session window ... not supported"): an
      // unpartitioned VPL session stream gets a constant grouping key
      // — one partition's worth of session state, exactly the
      // reference's single-threaded session semantics.
      val (aggSrc, aggKeys) =
        if (streaming && keys.isEmpty &&
            win.exists(_.isInstanceOf[graft.dsl.SessionWin]))
          (df.withColumn("__graft_gk", lit(0)), Seq("__graft_gk"))
        else (df, keys)
      df = EventStream(aggSrc, orderCol = ord, keys = aggKeys, win = win)
        .aggregate((direct ++ collects): _*)
      if (aggKeys ne keys) df = df.drop("__graft_gk")
      emas.foreach { case (n, _, p) =>
        // native codegen'd O(n) fold (EmaFold) with the old lambda's
        // null semantics (null element resets the accumulator)
        val alpha = 2.0 / (p + 1)
        df = df.withColumn(n,
          org.apache.spark.sql.graftbridge.ColumnBridge.column(
            graft.functions.EmaFold(
              org.apache.spark.sql.graftbridge.ColumnBridge.expression(
                sort_array(col(s"__vals_$n"))),
              alpha, 1.0 - alpha, nullResets = true)))
          .drop(s"__vals_$n")
      }
      postB.foreach { case (n, e) =>
        df = df.withColumn(n, translate(e, scalarCtx(df, None)))
      }
      df = df.drop(df.columns.filter(_.startsWith("__sub_")): _*)
      items.collect { case (n, _) if collides(n) => n }.foreach { n =>
        df = df.withColumn(n, col(s"__agg_$n")).drop(s"__agg_$n")
      }
      aggregated = true
    }

    /** Streaming sequence: the generic NFA over the raw staged
      * stream. Per step: local conjuncts (own fields only) evaluate
      * declaratively into a per-event step bitmask BEFORE the
      * stateful operator; correlation-key equalities `k == earlier.k`
      * become the groupByKey key; REMAINING cross-step conjuncts
      * (arithmetic against earlier steps' fields) compile to
      * serializable payload predicates ([[PayloadEval]]) evaluated at
      * run advancement — sase.rs evaluates per-edge predicates on the
      * live run's bound events the same way. Kleene `+`/`*` items
      * run as accumulating NFA steps (maximal-run semantics matching
      * [[graft.cep.Pattern.kleeneBetween]]); `len(alias)` /
      * `sum(alias.f)` in the emit read the run aggregates.
      */
    def buildStreamSeq(
        steps: Seq[(String, String, Option[VExpr], Option[String])],
        args: Seq[(String, VExpr)]): DataFrame = {
      import graft.streaming.PatternStream
      val ses = source match {
        case x: StreamingEvtSource => x
        case _ => throw VplCompileError(
          "streaming sequences need a StreamingEvtSource")
      }
      val withinUs = streamSeqWithinUs.getOrElse(throw VplCompileError(
        "streaming sequences require .within(d)"))
      val sparkType: String => String = {
        case "int" => "long"; case "float" => "double"
        case "bool" => "boolean"; case "timestamp" => "timestamp"
        case _ => "string"
      }
      val aliasIdx = steps.zipWithIndex.map { case ((_, a, _, _), i) => a -> i }.toMap
      val kinds: IndexedSeq[Int] = steps.map {
        case (_, _, _, None) => 0
        case (_, _, _, Some("+")) => 1
        case (_, _, _, Some("*")) => 2
        case (_, _, _, Some(other)) => throw VplCompileError(
          s"streaming sequence: Kleene '$other' unsupported (use + or *)")
      }.toIndexedSeq
      if (kinds.last != 0) throw VplCompileError(
        "streaming sequence: the final step must not be Kleene")
      def typesOf(t: String): Map[String, String] =
        ses.fieldsOf(t).map { case (f, ty) => f -> ty.stripSuffix("?") }.toMap
      val stepTypes: IndexedSeq[Map[String, String]] =
        steps.map { case (t, _, _, _) => typesOf(t) }.toIndexedSeq
      // self-qualified refs (`rising.x` inside rising's own where)
      // are the incoming event's fields
      def deSelf(e: VExpr, own: String): VExpr = e match {
        case VField(q, f) if q == own => VRef(f)
        case VBin(op, l, r) => VBin(op, deSelf(l, own), deSelf(r, own))
        case VUn(op, x)     => VUn(op, deSelf(x, own))
        case VCall(f, as)   => VCall(f, as.map(deSelf(_, own)))
        case VIf(c, t2, f2) => VIf(deSelf(c, own), deSelf(t2, own), deSelf(f2, own))
        case other          => other
      }
      // split wheres: local conjuncts → mask; key equalities → the
      // shuffle key; everything else → run-advance payload predicates.
      // A key equality may use DIFFERENT field names per step
      // (`source_host == first.target_host`, cyber-threat lateral
      // movement): each step records the field on ITS side, and the
      // key column picks the right field per event type below —
      // grouping then realizes the equality exactly.
      val stepKeyField = Array.fill[Option[String]](steps.size)(None)
      val crossBuf = IndexedSeq.fill(steps.size)(mutable.Buffer.empty[VExpr])
      val locals: Seq[Seq[VExpr]] = steps.zipWithIndex.map { case ((_, a, w, _), i) =>
        val cs = w.toSeq.flatMap(conjuncts).map(inlineFns(_)).map(deSelf(_, a))
        // own-side field f equated to earlier step j's field f2
        def keyEq(f: String, j: Int, f2: String, orig: VExpr): Seq[VExpr] =
          if (streamSeqKeys.nonEmpty) {
            // pattern partition-by: uniform keys; same-name equalities
            // on them are redundant, anything else is a predicate
            if (f == f2 && streamSeqKeys.contains(f)) Nil
            else { crossBuf(i) += orig; Nil }
          } else if (stepKeyField(j).forall(_ == f2) &&
            stepKeyField(i).forall(_ == f)) {
            stepKeyField(j) = Some(f2); stepKeyField(i) = Some(f); Nil
          } else { crossBuf(i) += orig; Nil }
        cs.flatMap {
          case c @ VBin("==", VRef(f), VField(q, f2))
              if aliasIdx.get(q).exists(_ < i) =>
            keyEq(f, aliasIdx(q), f2, c)
          case c @ VBin("==", VField(q, f2), VRef(f))
              if aliasIdx.get(q).exists(_ < i) =>
            keyEq(f, aliasIdx(q), f2, c)
          case c if aliasRefs(c).isEmpty => Seq(c)
          case c =>
            if (!aliasRefs(c).forall(q => aliasIdx.get(q).exists(_ < i)))
              throw VplCompileError(
                s"streaming sequence: predicate $c references a later step")
            crossBuf(i) += c; Nil
        }
      }
      val keys: Seq[String] =
        if (streamSeqKeys.nonEmpty) streamSeqKeys
        else stepKeyField.flatten.headOption.toSeq
      if (keys.isEmpty) throw VplCompileError(
        "streaming sequence: steps must correlate on a key " +
          "(f == head.f, or the pattern's partition by)")
      val preds: IndexedSeq[Option[PatternStream.GPred]] =
        crossBuf.zipWithIndex.map { case (b, i) =>
          if (b.isEmpty) None
          else Some(try PayloadEval.predicate(
            b.toSeq, stepTypes(i), aliasIdx, stepTypes)
          catch { case e: IllegalArgumentException =>
            throw VplCompileError(e.getMessage)
          })
        }
      // emit-time Kleene aggregate rewrites: len(alias) → __k_count,
      // sum(alias.f) → __k_sum (accumulated in-run; batch kleene's
      // n_b / sum_b)
      val sumFields = Array.fill[Option[String]](steps.size)(None)
      def rewriteEmit(e: VExpr): VExpr = e match {
        case VCall(fn, Seq(VRef(a)))
            if (fn == "len" || fn == "count") &&
              aliasIdx.get(a).exists(j => kinds(j) > 0) =>
          VRef(s"__kagg_len_${aliasIdx(a)}")
        case VCall("sum", Seq(VField(a, f)))
            if aliasIdx.get(a).exists(j => kinds(j) > 0) =>
          val j = aliasIdx(a)
          if (sumFields(j).exists(_ != f)) throw VplCompileError(
            s"streaming sequence: one accumulated sum per Kleene step " +
              s"(${sumFields(j).get} vs $f)")
          sumFields(j) = Some(f)
          VRef(s"__kagg_sum_$j")
        case VBin(op, l, r) => VBin(op, rewriteEmit(l), rewriteEmit(r))
        case VUn(op, x)     => VUn(op, rewriteEmit(x))
        case VCall(f, as)   => VCall(f, as.map(rewriteEmit))
        case VIf(c, t2, f2) => VIf(rewriteEmit(c), rewriteEmit(t2), rewriteEmit(f2))
        case other          => other
      }
      val emitArgs = args.map { case (n, e) => n -> rewriteEmit(inlineFns(e)) }
      val stepSpecs: IndexedSeq[PatternStream.GStepSpec] =
        kinds.indices.map(i => PatternStream.GStepSpec(
          kleene = kinds(i), pred = preds(i), sumField = sumFields(i)))
      val raw = ses.rawStream
        .withWatermark("ts", durStr(wmDelayUs.getOrElse(0L)))
      def stepCtx(t: String) = ExprCtx(
        bare = f => ses.fieldsOf(t).find(_._1 == f).map { case (_, ty) =>
          element_at(col("fields"), f).cast(sparkType(ty.stripSuffix("?")))
        },
        qualified = (_, _) => None)
      // `.not(T where k == a.k [and preds])` killers: per-neg mask bit
      // (nSteps + g); cross-step conjuncts evaluate against the held
      // match's payloads at kill time
      val negCross = IndexedSeq.fill(streamSeqNegs.size)(mutable.Buffer.empty[VExpr])
      val negKey = Array.fill[Option[String]](streamSeqNegs.size)(None)
      val negConds = streamSeqNegs.toSeq.zipWithIndex.map { case (n, g) =>
        val cs = n.where.toSeq.flatMap(conjuncts).map(inlineFns(_))
        // a killer's key equality may also use its own field name
        // (`source_host == first.target_host`) — record it so the key
        // column below shuffles killers into the right group
        def negKeyEq(f: String, j: Int, f2: String, orig: VExpr): Seq[VExpr] =
          if (streamSeqKeys.nonEmpty) {
            if (f == f2 && streamSeqKeys.contains(f)) Nil
            else { negCross(g) += orig; Nil }
          } else if (stepKeyField(j).contains(f2) && negKey(g).forall(_ == f)) {
            negKey(g) = Some(f); Nil
          } else { negCross(g) += orig; Nil }
        val negLocals = cs.flatMap {
          case c @ VBin("==", VRef(f), VField(q, f2)) if aliasIdx.contains(q) =>
            negKeyEq(f, aliasIdx(q), f2, c)
          case c @ VBin("==", VField(q, f2), VRef(f)) if aliasIdx.contains(q) =>
            negKeyEq(f, aliasIdx(q), f2, c)
          case c if aliasRefs(c).isEmpty => Seq(c)
          case c =>
            if (!aliasRefs(c).forall(aliasIdx.contains))
              throw VplCompileError(
                s"streaming .not: predicate $c references an unknown alias")
            negCross(g) += c; Nil
        }
        val local = negLocals.map(e => translate(e, stepCtx(n.eventType)))
          .reduceOption(_ && _).getOrElse(lit(true))
        col("event_type") === n.eventType && coalesce(local, lit(false))
      }
      val negPreds: IndexedSeq[Option[PatternStream.GPred]] =
        negCross.zipWithIndex.map { case (b, g) =>
          if (b.isEmpty) None
          else Some(try PayloadEval.predicate(b.toSeq,
            typesOf(streamSeqNegs(g).eventType), aliasIdx, stepTypes)
          catch { case e: IllegalArgumentException =>
            throw VplCompileError(e.getMessage)
          })
        }
      val nStepsHere = steps.size
      val negPred: Option[(Map[String, String], IndexedSeq[Map[String, String]])
          => Boolean] =
        if (negPreds.forall(_.isEmpty)) None
        else Some { (own, prior) =>
          // __neg_bits carries which neg conditions this event matched
          val bits = own.getOrElse("__neg_bits", "0").toLong
          negPreds.zipWithIndex.exists { case (p, g) =>
            ((bits >> g) & 1L) == 1L && p.forall(f => f(own, prior))
          }
        }
      val mask = (steps.zipWithIndex.map { case ((t, _, _, _), i) =>
        val local = locals(i).map(e => translate(e, stepCtx(t)))
          .reduceOption(_ && _).getOrElse(lit(true))
        when(col("event_type") === t && coalesce(local, lit(false)),
          lit(1L << i)).otherwise(lit(0L))
      } ++ negConds.zipWithIndex.map { case (c, g) =>
        when(c, lit(1L << (nStepsHere + g))).otherwise(lit(0L))
      }).reduce(_ + _)
      val negBits = negConds.zipWithIndex.map { case (c, g) =>
        when(c, lit(1L << g)).otherwise(lit(0L))
      }.reduceOption(_ + _).getOrElse(lit(0L))
      def fieldKeyExpr(f: String): Column =
        coalesce(element_at(col("fields"), f), lit(""))
      // per-event-type key field: one type must not serve two steps
      // keyed on different own-side fields (ambiguous shuffle key)
      val typeKeyField = mutable.LinkedHashMap.empty[String, String]
      def recordTypeKey(t: String, f: String): Unit =
        typeKeyField.get(t) match {
          case Some(g) if g != f => throw VplCompileError(
            s"streaming sequence: event type $t correlates via both $g and $f")
          case _ => typeKeyField(t) = f
        }
      if (streamSeqKeys.isEmpty) {
        steps.zipWithIndex.foreach { case ((t, _, _, _), i) =>
          recordTypeKey(t, stepKeyField(i).getOrElse(keys.head)) }
        streamSeqNegs.toSeq.zipWithIndex.foreach { case (n, g) =>
          recordTypeKey(n.eventType, negKey(g).getOrElse(keys.head)) }
      }
      val keyCol =
        if (keys.size > 1)
          // \u0001 separator: ("ab","c") must not collide with ("a","bc")
          concat_ws("", keys.map(fieldKeyExpr): _*)
        else if (typeKeyField.values.toSet.size <= 1)
          fieldKeyExpr(keys.head)
        else
          // mixed per-type key fields (lateral-movement shape): pick
          // the step's own-side field per event type
          typeKeyField.toSeq.foldRight(fieldKeyExpr(keys.head)) {
            case ((t, f), acc) =>
              when(col("event_type") === t, fieldKeyExpr(f)).otherwise(acc)
          }
      val gev = raw.select(
        col("event_id"),
        keyCol.as("key"),
        unix_micros(col("ts")).as("ts_us"),
        col("ts"),
        mask.as("mask"),
        map_concat(col("fields"), map(
          lit("__ts_us"), unix_micros(col("ts")).cast("string"),
          lit("__neg_bits"), negBits.cast("string"))).as("payload"))
      val sess = gev.sparkSession
      import sess.implicits._
      var matches = PatternStream.detectGeneric(
        gev.as[PatternStream.GEv],
        stepSpecs, withinUs,
        withNegation = streamSeqNegs.nonEmpty,
        negPred = negPred)(sess).toDF()
      // `.forecast` annotations: pre-fit model literals + per-match
      // forecast_time from the last PREFIX step's event time
      if (streamForecastCols.nonEmpty) {
        matches = matches.withColumn("forecast_time", timestamp_micros(
          col("payloads").getItem(steps.size - 1).getItem("__ts_us")
            .cast("long") + streamForecastHorizonUs))
        matches = matches.withColumn("forecast_expected_time",
          col("forecast_time"))
        streamForecastCols.foreach { case (n, c) =>
          matches = matches.withColumn(n, c)
        }
        // `confidence:` emission threshold (forecasting-tutorial.md)
        streamForecastMinProb.foreach { p =>
          matches = matches.filter(col("forecast_probability") >= p)
        }
      }
      // emit translation over the matched steps' payloads. A Kleene
      // step's slot holds its LAST matched element (sase.rs "previous"
      // semantics); the run aggregates surface via the __kagg_*
      // rewrites (len → __k_count, sum → __k_sum) and the run's
      // first element id via __k_first_id.
      val KaggLen = """__kagg_len_(\d+)""".r
      val KaggSum = """__kagg_sum_(\d+)""".r
      val emitCtx = ExprCtx(
        bare = {
          case KaggLen(j) => Some(col("payloads").getItem(j.toInt)
            .getItem(PatternStream.KCount).cast("long"))
          case KaggSum(j) => Some(col("payloads").getItem(j.toInt)
            .getItem(PatternStream.KSum).cast("double"))
          case f if keys.size == 1 && f == keys.head => Some(col("key"))
          case f if keys.contains(f) =>
            // multi-key: each key field rides every step's payload
            steps.zipWithIndex.reverse.collectFirst {
              case ((t, _, _, _), j) if ses.fieldsOf(t).exists(_._1 == f) =>
                col("payloads").getItem(j).getItem(f)
                  .cast(sparkType(typesOf(t).getOrElse(f, "str")))
            }
          case f if streamForecastCols.nonEmpty &&
              (f.startsWith("forecast_")) =>
            Some(col(f)) // attached to `matches` above
          case f =>
            steps.zipWithIndex.reverse.collectFirst {
              case ((t, _, _, _), j) if ses.fieldsOf(t).exists(_._1 == f) =>
                val ty = ses.fieldsOf(t).find(_._1 == f).get._2
                col("payloads").getItem(j).getItem(f)
                  .cast(sparkType(ty.stripSuffix("?")))
            }
        },
        qualified = (q, f) => aliasIdx.get(q).map { j =>
          val t = steps(j)._1
          if (f == "event_id") {
            // a skipped star step carries sentinel id -1 → NULL (the
            // batch left-outer's NULL run aggregates)
            if (kinds(j) > 0) when(col("payloads").getItem(j)
              .getItem(PatternStream.KCount).cast("long") > 0,
              col("ids").getItem(j))
            else col("ids").getItem(j)
          } else if (f == "first_event_id" && kinds(j) > 0)
            col("payloads").getItem(j)
              .getItem(PatternStream.KFirstId).cast("long")
          else if (f == "ts") timestamp_micros(
            col("payloads").getItem(j).getItem("__ts_us").cast("long"))
          else ses.fieldsOf(t).find(_._1 == f) match {
            case Some((_, ty)) => col("payloads").getItem(j).getItem(f)
              .cast(sparkType(ty.stripSuffix("?")))
            case None => lit(null)
          }
        }.orElse(
          // `.forecast`-truncated final step: refs resolve to NULL
          // (the event hasn't happened yet — batch ghost semantics)
          if (streamGhost.contains(q)) Some(lit(null)) else None))
      if (emitArgs.isEmpty) matches
      else matches.select(emitArgs.map { case (n, e) =>
        translate(e, emitCtx).as(n) }: _*)
    }

    /** Batch compile of `stream X = KleenePattern .emit(...)` — the
      * maximal-run realization ([[graft.cep.Pattern.kleeneBetween]] /
      * kleeneStarBetween) so batch rows match the streaming NFA's —
      * one row per (anchor, close) pair with `len(b)` / `sum(b.f)` /
      * `b.first_event_id` reading the run aggregates, and anchor /
      * last-element fields re-attached by id equi-joins. Local step
      * predicates only (a cross-step predicate here would need the
      * GRETA DP — compile the stream in streaming mode, or use the
      * inline `->` sequence form, both of which support them).
      */
    def buildBatchKleene(decl: VPatternDecl,
        args: Seq[(String, VExpr)]): DataFrame = {
      val items = decl.expr.asInstanceOf[SaseSeq].items
      val Seq(ia, ik, ic) = items
      val keys = decl.partitionBy.toSeq
      val aliases = items.zipWithIndex.map { case (it, i) =>
        it.alias.getOrElse(s"s$i")
      }
      val withinUs = decl.withinUs.getOrElse(throw VplCompileError(
        s"pattern '${decl.name}': Kleene stream source needs `within d`"))
      if (withinUs % 1000000L != 0) throw VplCompileError(
        s"pattern '${decl.name}': sub-second `within` unsupported in batch")
      // Cross-step predicates, split by where they can be evaluated
      // under maximal-run semantics (the streaming NFA's behavior):
      //  - on the Kleene step vs the ANCHOR (`B where x > first.x`):
      //    part of the B-attachment join condition;
      //  - on the CLOSE step vs the anchor or the run's LAST element
      //    (`C where x > rising.x` — sase.rs "previous" semantics,
      //    the Kleene slot holds its last matched element): a filter
      //    after the run aggregation, where both sides are attached.
      // Anything else (anchor referencing later steps; star-run close
      // predicates against a possibly-empty run) stays rejected.
      val crossB = mutable.Buffer.empty[VExpr]
      val crossC = mutable.Buffer.empty[VExpr]
      items.zipWithIndex.foreach { case (it, i) =>
        val own = it.alias.toSet
        it.where.toSeq.flatMap(conjuncts).foreach { cj =>
          val refs = aliasRefs(cj)
          if (refs.subsetOf(own)) () // local, stays in the step cond
          else if (i == 1 && refs.subsetOf(own ++ items(0).alias))
            crossB += cj
          else if (i == 2 && ik.kleene.contains("+") &&
              refs.subsetOf(own ++ items(0).alias ++ items(1).alias))
            crossC += cj
          else throw VplCompileError(
            s"pattern '${decl.name}': cross-step predicate $cj is not in " +
              "the batch Kleene-stream subset (run it streaming, or as " +
              "an inline -> sequence)")
        }
      }
      val union = items.map(_.eventType).distinct
        .map(t => withOrderCol(resolveAny(t)).withColumn("__etype", lit(t)))
        .reduce(_.unionByName(_, allowMissingColumns = true))
      val ucols = union.columns.toSet
      // step conditions carry their LOCAL conjuncts only; the cross
      // conjuncts collected above apply at the join / post-agg stage
      val localConjs: Seq[Seq[VExpr]] = items.map { it =>
        val own = it.alias.toSet
        it.where.toSeq.flatMap(conjuncts)
          .filter(cj => aliasRefs(cj).subsetOf(own))
      }
      def cond(it: SaseItem, alias: String): Column = {
        val ctx = ExprCtx(
          bare = f => if (ucols(f)) Some(col(f)) else None,
          qualified = (q, f) =>
            if (q == alias && ucols(f)) Some(col(f)) else None)
        val base = col("__etype") === it.eventType
        localConjs(items.indexOf(it))
          .map(w => translate(inlineFns(w), ctx)).foldLeft(base)(_ && _)
      }
      // emit rewrites mirror buildStreamSeq: len/count(b) → n_b,
      // sum(b.f) → sum_b (one accumulated field, = kleeneBetween's
      // bValueCol)
      var sumField: Option[String] = None
      def rewrite(e: VExpr): VExpr = e match {
        case VCall(fn, Seq(VRef(a)))
            if (fn == "len" || fn == "count") && a == aliases(1) =>
          VRef("__kb_len")
        case VCall("sum", Seq(VField(a, f))) if a == aliases(1) =>
          if (sumField.exists(_ != f)) throw VplCompileError(
            s"pattern '${decl.name}': one accumulated sum per Kleene " +
              s"step (${sumField.get} vs $f)")
          sumField = Some(f)
          VRef("__kb_sum")
        case VBin(op, l, r) => VBin(op, rewrite(l), rewrite(r))
        case VUn(op, x)     => VUn(op, rewrite(x))
        case VCall(f, as)   => VCall(f, as.map(rewrite))
        case VIf(c, t2, f2) => VIf(rewrite(c), rewrite(t2), rewrite(f2))
        case other          => other
      }
      val emitArgs = args.map { case (n, e) => n -> rewrite(inlineFns(e)) }
      if (sumField.exists(f => !ucols(f))) throw VplCompileError(
        s"pattern '${decl.name}': sum field '${sumField.get}' not found")
      val steps = items.zip(aliases).map { case (it, a) =>
        graft.cep.Step(a, cond(it, a))
      }
      // anchored Kleene-step predicate → B-attachment join condition
      // over the kleene functions' single-underscore prefixed columns
      val bCross: Column = {
        val bctx = ExprCtx(
          bare = f =>
            if (ucols(f)) Some(col(s"${aliases(1)}_$f")) else None,
          qualified = (q, f) =>
            if ((q == aliases(0) || q == aliases(1)) && ucols(f))
              Some(col(s"${q}_$f"))
            else None)
        crossB.toSeq.map(w => translate(inlineFns(w), bctx))
          .foldLeft(lit(true))(_ && _)
      }
      val kb =
        if (ik.kleene.contains("*"))
          graft.cep.Pattern.kleeneStarBetween(union, steps(0), steps(1),
            steps(2), withinUs / 1000000L, keys,
            bValueCol = sumField.getOrElse("event_id"),
            bCrossPred = bCross)
        else
          graft.cep.Pattern.kleeneBetween(union, steps(0), steps(1),
            steps(2), withinUs / 1000000L, keys,
            bValueCol = sumField.getOrElse("event_id"),
            bCrossPred = bCross)
      // re-attach step payload fields by id (anchors inner, last-B left
      // — a star run may be empty)
      def side(it: SaseItem, alias: String): DataFrame = {
        val d = union.filter(cond(it, alias))
        d.columns.foldLeft(d)((dd, cc) =>
          dd.withColumnRenamed(cc, s"${alias}__$cc"))
      }
      val out = kb
        .join(side(ia, aliases(0)),
          col("a_id") === col(s"${aliases(0)}__event_id"))
        .join(side(ic, aliases(2)),
          col("c_id") === col(s"${aliases(2)}__event_id"))
        .join(side(ik, aliases(1)),
          col("last_b") === col(s"${aliases(1)}__event_id"), "left")
      val ocols = out.columns.toSet
      val ectx = ExprCtx(
        bare = {
          case "__kb_len"   => Some(col("n_b"))
          case "__kb_sum"   => Some(col("sum_b"))
          case f => aliases.reverse.collectFirst {
            case a if ocols(s"${a}__$f") => col(s"${a}__$f")
          }
        },
        qualified = (q, f) =>
          if (q == aliases(0) && f == "event_id") Some(col("a_id"))
          else if (q == aliases(2) && f == "event_id") Some(col("c_id"))
          else if (q == aliases(1) && f == "event_id") Some(col("last_b"))
          else if (q == aliases(1) && f == "first_event_id")
            Some(col("first_b"))
          else if (ocols(s"${q}__$f")) Some(col(s"${q}__$f"))
          else if (aliases.contains(q)) Some(lit(null))
          else None)
      // close-step cross predicates (vs the anchor or the run's LAST
      // element — both sides are attached by the id joins above)
      val outF = crossC.foldLeft(out)((d, cj) =>
        d.filter(translate(inlineFns(cj), ectx)))
      if (emitArgs.isEmpty) {
        if (crossC.isEmpty) kb
        else outF.select((kb.columns.toSeq).map(col): _*)
      } else outF.select(emitArgs.map { case (n, e) =>
        translate(e, ectx).as(n) }: _*)
    }

    def isTrendAgg(e: VExpr): Boolean = inlineFns(e) match {
      case VCall("count_trends" | "count_events" | "sum_trends" |
        "avg_trends" | "min_trends" | "max_trends", _) => true
      case _ => false
    }

    /** `.trend_aggregate(...)` after an inline `-> all` sequence
      * (reference aggregation mode, docs/reference/trend-aggregation
      * .md; GRETA, Poppe et al. VLDB'17): count trends WITHOUT
      * enumerating them. Supported shapes — the anchored Kleene forms
      * the reference's own benchmark uses (13_trend_aggregation.vpl):
      *
      *   A as a -> all B where p(B, a) as r                 (2 steps)
      *   A as a -> all B where p(B, a) as r -> C where q(C, r) (3)
      *
      * A trend = the anchor + a non-empty ordered subset of its
      * qualifying events (+ the close). Closed forms, derived from
      * "last element of the subset" (sase.rs previous semantics —
      * the close predicate sees the subset's LAST element):
      * with r_i = #qualifying events between the anchor and event i,
      *
      *   count_trends  = Σ_i 2^(r_i)  over valid (anchor, i [, close])
      *   count_events  = Σ_i (2^(r_i) + r_i · 2^(r_i − 1))
      *     (subsets with last = i have 2^(r_i) total members beyond
      *      the forced i... each of the r_i earlier events appears in
      *      half the subsets — the docs' "an event that appears in 5
      *      trends is counted 5 times")
      *
      * For the 2-step form these telescope to the familiar
      * Σ_a (2^(n_a) − 1) and Σ_a n_a·2^(n_a − 1). Grouping: partition
      * keys + a tumbling `within`-sized window of the ANCHOR's event
      * time (the reference emits at window close). Per-term powers
      * are exact longs guarded at 2^62; the sums accumulate in
      * DECIMAL(38,0) and surface as BIGINT (NULL past the guard —
      * the established count_trends overflow contract).
      *
      * Plan shape: two (or three) equi-joins on the partition keys
      * with time/order residuals — the same shuffle story as every
      * other pattern join (never a cross product) — then one
      * partial-agg groupBy on (keys, window).
      */
    def buildTrendAggregate(aggs: Seq[(String, VExpr)]): Unit = {
      val st = seq.get
      val steps = st.steps.toSeq
      if (steps.size < 2 || steps.size > 3 || !steps(1).matchAll)
        throw VplCompileError(
          ".trend_aggregate needs `A -> all B [-> C]` (anchored Kleene)")
      val withinUs = st.withinUs.getOrElse(throw VplCompileError(
        ".trend_aggregate needs `.within(d)`"))
      val aA = steps(0).alias
      val aR = steps(1).alias
      def pfx(b: Bound): DataFrame = prefixed(withOrderCol(b.df), b.alias)
      def ctxFor(own: String, earlier: Seq[(String, Set[String])],
          ownCols: Set[String]): ExprCtx = ExprCtx(
        bare = f =>
          if (ownCols(s"${own}__$f")) Some(col(s"${own}__$f")) else None,
        qualified = (q, f) =>
          if (q == own && ownCols(s"${own}__$f")) Some(col(s"${own}__$f"))
          else earlier.collectFirst {
            case (a2, cs) if a2 == q =>
              if (cs(s"${a2}__$f")) col(s"${a2}__$f") else lit(null)
          })
      val dfA = pfx(steps(0))
      val dfR = pfx(steps(1))
      val colsA = dfA.columns.toSet
      val colsR = dfR.columns.toSet
      val keyEqAR = keys.map(k => col(s"${aA}__$k") === col(s"${aR}__$k"))
        .reduceOption(_ && _).getOrElse(lit(true))
      val spanAR =
        unix_micros(col(s"${aR}__ts")) - unix_micros(col(s"${aA}__ts"))
      var ar = dfA.join(dfR,
        keyEqAR && col(s"${aR}__event_id") > col(s"${aA}__event_id") &&
          spanAR >= 0 && spanAR <= withinUs)
      Seq(steps(0).where.map(w => translate(inlineFns(w),
          ctxFor(aA, Nil, colsA))),
        steps(1).where.map(w => translate(inlineFns(w),
          ctxFor(aR, Seq(aA -> colsA), colsR)))).flatten
        .foreach(c => ar = ar.filter(c))
      // r_i = qualifying events between the anchor and event i
      val wA = org.apache.spark.sql.expressions.Window
        .partitionBy(col(s"${aA}__event_id"))
        .orderBy(col(s"${aR}__event_id"))
      var terms = ar.withColumn("__r",
        row_number().over(wA).cast("long") - 1L)
      if (steps.size == 3) {
        val aC = steps(2).alias
        val dfC = pfx(steps(2))
        val colsC = dfC.columns.toSet
        val keyEqRC = keys.map(k => col(s"${aR}__$k") === col(s"${aC}__$k"))
          .reduceOption(_ && _).getOrElse(lit(true))
        val spanAC =
          unix_micros(col(s"${aC}__ts")) - unix_micros(col(s"${aA}__ts"))
        terms = terms.join(dfC,
          keyEqRC && col(s"${aC}__event_id") > col(s"${aR}__event_id") &&
            spanAC >= 0 && spanAC <= withinUs)
        steps(2).where.foreach(w => terms = terms.filter(
          translate(inlineFns(w),
            ctxFor(aC, Seq(aA -> colsA, aR -> colsR), colsC))))
      }
      // exact per-term powers, guarded; DECIMAL(38,0) accumulation
      def p2(e: Column): Column =
        when(e <= 62L && e >= 0L,
          call_function("shiftleft", lit(1L), e.cast("int")))
      val termTrends = p2(col("__r"))
      val termEvents = p2(col("__r")) +
        col("__r") * coalesce(p2(col("__r") - 1L), lit(0L))
      val winDur = s"${withinUs / 1000000L} seconds"
      val outAggs = aggs.map { case (n, e) => inlineFns(e) match {
        case VCall("count_trends", _) =>
          sum(termTrends.cast("decimal(38,0)")).cast("bigint").as(n)
        case VCall("count_events", as)
            if as.isEmpty || as == Seq(VRef(aR)) =>
          sum(termEvents.cast("decimal(38,0)")).cast("bigint").as(n)
        case other => throw VplCompileError(
          s".trend_aggregate: unsupported aggregate $other " +
            "(count_trends / count_events only)")
      }}
      df = terms
        .groupBy(keys.map(k => col(s"${aA}__$k").as(k)) :+
          window(col(s"${aA}__ts"), winDur).as("__w"): _*)
        .agg(outAggs.head, outAggs.tail: _*)
        .withColumn("win_start", col("__w.start").cast("long"))
        .drop("__w")
      seq = None
      aggregated = true
    }

    def ensureSeq(): SeqState = seq.getOrElse {
      val headName = s.source match {
        case SrcName(n, _) => n
        case _ => throw VplCompileError("sequence must start from a named source")
      }
      val st = new SeqState(Bound(headAlias.getOrElse(headName),
        withOrderCol(df), None, headName))
      seq = Some(st)
      st
    }

    def materializeSeq(): Unit = seq.foreach { st =>
      if (!seqMaterialized) {
        df = buildSequence(st)
        seqMaterialized = true
        // seq stays set for emit-time alias resolution
      }
    }

    for (op <- s.ops if !finished) op match {
      case op2 if batchKleeneDecl.isDefined && !op2.isInstanceOf[OpEmit] &&
          !op2.isInstanceOf[OpWatermark] && !op2.isInstanceOf[OpFrom] &&
          !op2.isInstanceOf[OpTo] =>
        // the placeholder df is NOT the pattern's output — refuse ops
        // this subset doesn't fold into the maximal-run compile rather
        // than silently applying them to the wrong frame
        throw VplCompileError(
          s"batch Kleene pattern stream supports only .watermark/.emit " +
            s"(got $op2); use the inline -> sequence form for more")

      case OpFrom(_, _) | OpTo(_, _) | OpContext(_) | OpTapLike(_, _) |
          OpAllowedLateness(_) => () // .to handled post-loop (it may follow emit)

      case OpWatermark(params) =>
        if (streaming) {
          val us = (params.collect { case (_, VDur(u)) => u } ++
            params.collect { case (_, VInt(v)) => v * 1000000L }).headOption
            .getOrElse(throw VplCompileError(
              ".watermark expects a duration (out_of_order: 2s)"))
          wmDelayUs = Some(us)
          if (streamSeq.isEmpty) {
            df = df.withWatermark("ts", durStr(us))
            watermarked = true
            settleType()
          }
        }

      case OpFollowedBy(step) =>
        if (streaming) {
          // accumulate; the generic NFA builds at emit
          val buf = streamSeq.getOrElse {
            val headName = s.source match {
              case SrcName(n, _) => n
              case _ => throw VplCompileError(
                "streaming sequence must start from a named event type")
            }
            val b = mutable.Buffer(
              (headName, headAlias.getOrElse(headName), Option.empty[VExpr],
                Option.empty[String]))
            streamSeq = Some(b)
            b
          }
          buf += ((step.eventType,
            step.alias.getOrElse(s"s${buf.size}"), step.where, None))
        } else {
          val st = ensureSeq()
          st.steps += Bound(
            step.alias.getOrElse(s"s${st.steps.size}"),
            withOrderCol(dynamicize(resolveAny(step.eventType))), step.where,
            step.eventType, step.matchAll)
        }

      case OpWithin(VDur(us)) =>
        if (streaming && streamSeq.isDefined) streamSeqWithinUs = Some(us)
        else ensureSeq().withinUs = Some(us)
      case OpWithin(other) =>
        throw VplCompileError(s".within expects a duration, got $other")

      case OpNot(step) =>
        if (streaming && streamSeq.isDefined) streamSeqNegs += step
        else if (streaming) throw VplCompileError(
          "streaming negation outside a sequence is served by PatternStream.detectAbsence")
        else ensureSeq().negs += step

      case OpWhere(e) if streaming && streamSeq.isDefined =>
        // post-sequence cross-step filter (electrical ConsumptionSpike):
        // conjoin onto the FINAL step — completion is the only moment
        // every referenced step is bound, so filtering the closing
        // transition is equivalent to filtering emitted matches
        val buf = streamSeq.get
        val (t, a, w, kl) = buf.last
        buf(buf.size - 1) =
          (t, a, w.map(VBin("and", _, e)).orElse(Some(e)), kl)

      case OpWhere(e) =>
        settleType()
        seq match {
          case Some(st) if !aggregated && !seqMaterialized =>
            st.postFilters += e
          case _ =>
            if (!aggregated && win.isDefined && containsAgg(inlineFns(e)))
              pendingAggWhere += e // implicit aggregate, settled at emit
            else if (streaming && !aggregated &&
              df.columns.contains("event_type"))
              // pre-aggregation filters must not drop the sentinel
              // (they push below the watermark node)
              df = df.filter(translate(e, ctx) ||
                col("event_type") === "__sentinel")
            else df = df.filter(translate(e, ctx))
        }
      case OpHaving(e) =>
        settleType(); df = df.filter(translate(e, ctx))

      case OpSelect(items) =>
        settleType()
        applyJoinWindow()
        val c = ctx
        df = df.select(items.map {
          case (n, Some(e)) => translate(e, c).as(n)
          case (n, None)    => translate(VRef(n), c).as(n)
        }: _*)
        // the projection DEFINES the stream's columns from here on:
        // later .where/.emit resolve the select's output names, not
        // the join inputs' qualified columns (ema_crossover's emit
        // after select previously died on the stale join context)
        joinInputs = None

      case OpOn(e) =>
        val ins = joinInputs.getOrElse(
          throw VplCompileError(".on without a join(...) source"))
        df = buildJoin(ins, e)

      case OpProcess(call) =>
        // `.process(gen(3, 2))`: unroll the statement fn at compile
        // time into K emit rows per input event (loop bounds must be
        // compile-time constants), then posexplode — each input event
        // fans out to K generated events, fully inside Catalyst
        // (emit_process.vpl; reference interprets the same loops per
        // event at runtime)
        settleType()
        // the end-of-stream sentinel served the watermark upstream; it
        // must not fan out into generated events
        if (streaming && df.columns.contains("event_type"))
          df = df.filter(col("event_type") =!= "__sentinel")
        val (fn, args) = call match {
          case VCall(n, as) if fns.get(n).exists(_.stmts.nonEmpty) =>
            (fns(n), as)
          case other =>
            throw VplCompileError(s".process expects a statement-fn call, got $other")
        }
        if (fn.params.size != args.size)
          throw VplCompileError(
            s".process ${fn.name}: expected ${fn.params.size} args, got ${args.size}")
        def constInt(e: VExpr): Long = e match {
          case VInt(v)       => v
          case VBin("+", l, r) => constInt(l) + constInt(r)
          case VBin("-", l, r) => constInt(l) - constInt(r)
          case VBin("*", l, r) => constInt(l) * constInt(r)
          case VUn("-", x)   => -constInt(x)
          case other =>
            throw VplCompileError(s".process: loop bound must be a constant, got $other")
        }
        val rows = mutable.Buffer.empty[Seq[(String, VExpr)]]
        def exec(stmts: Seq[VStmt], env: Map[String, VExpr]): Unit =
          stmts.foreach {
            case SFor(v, from, to, incl, body) =>
              val a = constInt(substitute(from, env))
              val b = constInt(substitute(to, env))
              val end = if (incl) b else b - 1
              (a to end).foreach(i => exec(body, env + (v -> VInt(i))))
            case SEmitStmt(_, eargs) =>
              rows += eargs.map { case (n, e) => n -> substitute(e, env) }
            case other => throw VplCompileError(
              s".process bodies support for/emit plus the interpreted " +
                s"constant-argument subset; unexpected $other")
          }
        def isSimple(sts: Seq[VStmt]): Boolean = sts.forall {
          case SFor(_, _, _, _, b) => isSimple(b)
          case _: SEmitStmt        => true
          case _                   => false
        }
        // generated rows too numerous for an array-of-structs literal
        // land in a driver-built DataFrame instead (cross-joined with
        // the trigger stream) — batch only
        var bigGen: Option[(DataFrame, Int, Seq[String])] = None
        if (isSimple(fn.stmts)) {
          // pure for/emit bodies unroll symbolically: emitted exprs
          // may still reference EVENT columns, translated per row
          exec(fn.stmts, fn.params.map(_._1).zip(args).toMap)
        } else {
          // full statement bodies (lets, :=, while, nested fn calls —
          // the mandelbrot demos' compute_tile) interpret at compile
          // time under constant args, collecting the emit stream
          val cvals = VplInterp.constArgs(args).getOrElse(
            throw VplCompileError(
              s".process ${fn.name}: statement bodies beyond for/emit " +
                "interpret at compile time and need CONSTANT arguments"))
          val emitted = VplInterp.collectEmits(fns, fn, cvals)
          if (emitted.isEmpty)
            throw VplCompileError(s".process ${fn.name}: no emit reached")
          val enames = emitted.head._2.map(_._1)
          if (!emitted.forall(_._2.map(_._1) == enames))
            throw VplCompileError(".process: all emits must produce the same fields")
          if (emitted.size <= 10000) {
            emitted.foreach { case (_, fs) =>
              rows += fs.map { case (n, v) => n -> VplInterp.toExpr(v) }
            }
          } else if (emitted.size > 1000000) {
            throw VplCompileError(
              s".process ${fn.name}: unrolls to ${emitted.size} emits (>1000000)")
          } else if (streaming) {
            throw VplCompileError(
              s".process ${fn.name}: ${emitted.size} generated events " +
                "exceed the streaming fan-out cap (10000) — stream-side " +
                "cross joins are unsupported; run this stream in batch")
          } else {
            import org.apache.spark.sql.types._
            // per-field type: Double wins over Long when mixed
            val fieldTypes = enames.indices.map { fi =>
              val vs = emitted.iterator.map(_._2(fi)._2)
              var anyD = false; var anyB = false; var anyS = false
              vs.foreach {
                case _: Double  => anyD = true
                case _: Boolean => anyB = true
                case _: Long    => ()
                case _          => anyS = true
              }
              if (anyS) StringType
              else if (anyD) DoubleType
              else if (anyB) BooleanType
              else LongType
            }
            val schema = StructType(
              StructField("pos", LongType, nullable = false) +:
                enames.zip(fieldTypes).map { case (n, t) =>
                  StructField(n, t, nullable = true)
                })
            val rowsJ = new java.util.ArrayList[org.apache.spark.sql.Row](emitted.size)
            emitted.zipWithIndex.foreach { case ((_, fs), i) =>
              val vals = fs.map(_._2).zip(fieldTypes).map {
                case (v: Long, DoubleType) => v.toDouble
                case (v, StringType) if v != null && !v.isInstanceOf[String] => v.toString
                case (v, _) => v
              }
              rowsJ.add(org.apache.spark.sql.Row.fromSeq(i.toLong +: vals))
            }
            bigGen = Some((df.sparkSession.createDataFrame(rowsJ, schema),
              emitted.size, enames))
          }
        }
        // the generated frame rides next to carried ts/event_id/pos
        // columns — an emit field reusing those names would shadow the
        // carry silently (crossJoin + col(name) ambiguity)
        def rejectReservedEmits(names: Seq[String]): Unit = {
          val clash = names.filter(Set("ts", "event_id", "pos"))
          if (clash.nonEmpty) throw VplCompileError(
            s".process ${fn.name}: emit field(s) ${clash.mkString(", ")} " +
              "collide with the carried ts/event_id/pos columns — " +
              "rename the emitted field(s)")
        }
        // event_id * k + pos must not wrap: k is the per-event fan-out
        // (pos < k, so the safe cap leaves room for the largest pos)
        def composedId(k: Int): Column = {
          val k1 = math.max(k, 1)
          val cap = (Long.MaxValue - (k1 - 1)) / k1
          when(col("event_id") > cap || col("event_id") < 0L,
            expr(s"raise_error('.process ${fn.name}: event_id * $k " +
              "overflows the synthesized arrival order')").cast("long"))
            .otherwise(col("event_id") * k + col("pos"))
        }
        bigGen match {
          case Some((gen, k, enames)) =>
            rejectReservedEmits(enames)
            val carry =
              (if (df.columns.contains("ts")) Seq(col("ts")) else Nil) ++
                (if (df.columns.contains("event_id")) Seq(col("event_id")) else Nil)
            df = df.select(carry: _*).crossJoin(gen)
            val outCols = enames.map(col) ++
              (if (df.columns.contains("ts")) Seq(col("ts")) else Nil) ++
              (if (df.columns.contains("event_id"))
                Seq(composedId(k).as("event_id"))
              else Nil)
            df = df.select(outCols: _*)
          case None =>
            if (rows.isEmpty)
              throw VplCompileError(s".process ${fn.name}: no emit reached")
            val names = rows.head.map(_._1)
            require(rows.forall(_.map(_._1) == names),
              ".process: all emits must produce the same fields")
            rejectReservedEmits(names)
            if (rows.size > 10000)
              throw VplCompileError(
                s".process ${fn.name}: unrolls to ${rows.size} emits (>10000)")
            val c0 = ctx
            val structs = rows.toSeq.map(r =>
              struct(r.map { case (n, e) => translate(e, c0).as(n) }: _*))
            val carry =
              (if (df.columns.contains("ts")) Seq(col("ts")) else Nil) ++
                (if (df.columns.contains("event_id")) Seq(col("event_id")) else Nil)
            df = df
              .select(carry :+ posexplode(array(structs: _*)): _*)
              .withColumnRenamed("col", "__e")
            val outCols = names.map(n => col(s"__e.$n").as(n)) ++
              (if (df.columns.contains("ts")) Seq(col("ts")) else Nil) ++
              (if (df.columns.contains("event_id"))
                // unique arrival order for the generated events
                Seq(composedId(rows.size).as("event_id"))
              else Nil)
            df = df.select(outCols: _*)
        }

      case OpPartitionBy(cols) => keys = cols
      case w: OpWindow =>
        win = Some(windowSpec(w))
        if (joinInputs.isDefined) w.positional match {
          case Seq(VDur(us)) => joinWinUs = Some(us)
          case _             => ()
        }

      case OpAggregate(aggs) =>
        if (seq.isDefined && aggs.exists(a => isTrendAgg(a._2)))
          buildTrendAggregate(aggs)
        else if (seq.isDefined)
          throw VplCompileError("aggregate after sequence not supported")
        else runAgg(aggs)

      case OpEnrich(connector, params) =>
        // `.enrich(Conn, key: expr, fields: [..], fallback: lit?)`
        // (enrichment/: broadcast lookup + fallback). A bound
        // connector joins broadcast; an unbound one degrades to
        // fallback/NULL columns with enrich_status "miss", exactly
        // how the reference behaves with the connector down.
        if (seq.isDefined) throw VplCompileError(
          ".enrich after a sequence is outside the compiled subset")
        val pm = params.toMap
        val fieldNames = pm.get("fields") match {
          case Some(VList(items)) => items.map {
            case VRef(n) => n
            case other => throw VplCompileError(s".enrich fields: expected names, got $other")
          }
          case _ => throw VplCompileError(".enrich needs fields: [name, ...]")
        }
        val keyExpr = pm.getOrElse("key",
          throw VplCompileError(".enrich needs key: expr"))
        val fallbackLit: Option[Column] = pm.get("fallback").map(e =>
          translate(e, ctx))
        // an `.enrich` aimed at a bound HTTP connector with no
        // explicit lookup frame resolves one by fetching the stream's
        // DISTINCT keys from the endpoint (enrichment/http.rs `GET
        // url?key=K` per key — batched here: one fetch per distinct
        // key is a perfectly-warm cache.rs). Batch mode only: a
        // streaming plan can't enumerate its keys up front — long
        // runs refresh dims via HttpEnrichment.TtlLookup in
        // foreachBatch instead.
        val httpLookup: Option[DataFrame] =
          if (lookups.contains(connector) || streaming) None
          else sourceConns.get(connector).collect {
            case h: graft.sources.HttpConnector if h.sinkUrl.nonEmpty =>
              val keyCol = translate(keyExpr, ctx).cast("string")
              val keys = df.select(keyCol.as("k")).na.drop().distinct()
                .limit(graft.sources.HttpEnrichment.MaxKeys + 1)
                .collect().map(_.getString(0)).toSeq
              val keyName = "__http_key"
              graft.sources.HttpEnrichment.lookup(
                df.sparkSession, h.sinkUrl, keyName, keys, fieldNames,
                headers = h.headers)
          }
        lookups.get(connector).map(lk => (lk, false))
          .orElse(httpLookup.map(lk => (lk, true))) match {
          case Some((lk, viaHttp)) =>
            val keyName =
              if (viaHttp) "__http_key"
              else keyExpr match {
                case VField(_, f) => f
                case VRef(f)      => f
                case _            => "key"
              }
            require(lk.columns.contains(keyName),
              s".enrich: lookup for $connector needs a '$keyName' column")
            val lkSel = lk.select(
              (col(keyName).as("__enrich_key") +: fieldNames.map(col)): _*)
            // the HTTP lookup carries string keys (JSON transport);
            // compare in string space so numeric probe keys match
            val probeKey =
              if (viaHttp) translate(keyExpr, ctx).cast("string")
              else translate(keyExpr, ctx)
            df = df.join(broadcast(lkSel),
              probeKey === col("__enrich_key"), "left")
            df = df.withColumn("enrich_status",
              when(col("__enrich_key").isNotNull, lit("ok"))
                .otherwise(lit(if (fallbackLit.isDefined) "fallback" else "miss")))
            fallbackLit.foreach { fb =>
              fieldNames.foreach(f =>
                df = df.withColumn(f, coalesce(col(f), fb)))
            }
            df = df.drop("__enrich_key")
          case None =>
            fieldNames.foreach(f =>
              df = df.withColumn(f, fallbackLit.getOrElse(lit(null))))
            df = df.withColumn("enrich_status",
              lit(if (fallbackLit.isDefined) "fallback" else "miss"))
        }
        df = df.withColumn("enrich_latency_ms", lit(0L))

      case OpScore(params) =>
        // `.score(model: "fraud.onnx", inputs: [amount, risk],
        // outputs: [prob, category])` — scoring.rs's per-event model
        // inference as a narrow map (works identically on batch frames
        // and live streams). A registered Model scores with its real
        // implementation; an unbound model name gets the deterministic
        // stand-in: output j = 0.5 + 0.5·z/(1+|z|) with
        // z = j + Σ_i input_i/(i+1) — reproducible across engines and
        // runs, so pipelines are testable end to end without an ONNX
        // runtime (§6 non-goal).
        val spm = params.toMap
        val modelName = spm.get("model") match {
          case Some(VStr(m)) => m
          case _ => throw VplCompileError(""".score needs model: "name"""")
        }
        def fieldList(key: String): Seq[String] = spm.get(key) match {
          case Some(VList(items)) => items.map {
            case VRef(n)      => n
            case VField(_, f) => f
            case VStr(n)      => n
            case other => throw VplCompileError(
              s".score $key: expected field names, got $other")
          }
          case _ => Nil
        }
        val scoreInputs = fieldList("inputs")
        val scoreOutputs = {
          val o = fieldList("outputs"); if (o.isEmpty) Seq("score") else o
        }
        models.get(modelName) match {
          case Some(m) => df = m.score(df)
          case None =>
            val c = ctx
            scoreOutputs.zipWithIndex.foreach { case (o, j) =>
              val z = scoreInputs.zipWithIndex.foldLeft(lit(j.toDouble)) {
                case (acc, (f, i)) =>
                  acc + coalesce(c.bare(f).getOrElse(lit(null))
                    .cast("double"), lit(0.0)) / (i + 1.0)
              }
              df = df.withColumn(o,
                lit(0.5) + lit(0.5) * z / (lit(1.0) + abs(z)))
            }
        }

      case OpForecast(params) if streaming && streamSeq.isDefined =>
        // streaming `.forecast`: same prefix-truncation + transition
        // model as the batch branch below, but the model is fit ONCE
        // on the staged batch data (pst/online.rs's online updates are
        // a declared simplification — the fit is training state) and
        // its single surviving (prob, cnt) row is collected to
        // literals, so the live annotation is pure column arithmetic
        // per micro-batch with no stream-static join in the hot path.
        val pmS = params.toMap
        streamForecastHorizonUs = pmS.get("horizon") match {
          case Some(VDur(us)) => us
          case _              => 3600000000L
        }
        // mode presets + overrides via the shared forecastParams
        // bundle. Hawkes burst modulation is neutral (1.0) in this
        // pre-fit-literal surrogate — builtins.md's normal-rate value;
        // the full intensity operators live in f4/f6/s32.
        val (_, fDepthCapS, fConformalS, _, fMinProbS) = forecastParams(pmS)
        streamForecastMinProb = fMinProbS
        val bufF = streamSeq.get
        if (bufF.size < 2) throw VplCompileError(
          ".forecast needs a sequence of 2+ steps")
        val (fTyp, fAlias, _, fKleene) = bufF.last
        if (fKleene.nonEmpty) throw VplCompileError(
          ".forecast: the forecast step must not be Kleene")
        bufF.remove(bufF.size - 1)
        streamGhost = Some(fAlias)
        val sesF = source match {
          case x: StreamingEvtSource => x
          case _ => throw VplCompileError(
            "streaming sequences need a StreamingEvtSource")
        }
        val keyFieldsF = (streamSeqKeys ++
          bufF.flatMap(_._3).flatMap(conjuncts).collect {
            case VBin("==", VRef(f), VField(_, f2)) if f == f2 => f
            case VBin("==", VField(_, f2), VRef(f)) if f == f2 => f
          }).distinct
        val all0F = sesF.allEvents
        val keyColF = keyFieldsF.headOption.flatMap { k =>
          if (all0F.columns.contains(k)) Some(col(k))
          else if (all0F.columns.contains("fields"))
            Some(element_at(col("fields"), k))
          else None
        }
        val allF = keyColF.map(kc => all0F.withColumn("__fk", kc))
          .getOrElse(all0F)
        val prefixTypesF = bufF.map(_._1).toSeq
        val maxDepthF = math.min(prefixTypesF.size, fDepthCapS)
        val pstF = graft.cep.Forecast.pstScores(allF,
          maxDepth = maxDepthF,
          typeCol = "event_type",
          partitionKeys = if (keyColF.isDefined) Seq("__fk") else Nil,
          orderCol = "event_id")
          .filter(col("nxt") === fTyp)
        val candidatesF = (maxDepthF to 1 by -1).map(k =>
          col("depth") === k &&
            col("context") === prefixTypesF.takeRight(k).mkString(">"))
        val modelRow = pstF.filter(candidatesF.reduce(_ || _))
          .orderBy(col("depth").desc).limit(1)
          .select(col("prob").cast("double"), col("cnt").cast("long"),
            col("depth").cast("int"))
          .collect().headOption
        val (fProb, fCnt, fDepth) = modelRow
          .map(r => (r.getDouble(0), r.getLong(1), r.getInt(2)))
          .getOrElse((0.0, 0L, 0))
        // conformal q90 from the matched context's two-point residual
        // distribution (see the batch OpForecast arm for derivation)
        val fQ = if (fProb <= 0.1) fProb
          else if (fProb >= 0.9) 1.0 - fProb
          else math.max(fProb, 1.0 - fProb)
        streamForecastCols = Seq(
          "forecast_probability" -> lit(fProb),
          "forecast_count" -> lit(fCnt),
          "forecast_confidence" ->
            lit(1.0 - 1.0 / (1.0 + fCnt.toDouble)),
          "forecast_state" -> lit(prefixTypesF.mkString(">")),
          "forecast_context_depth" -> lit(fDepth)) ++
          (if (fConformalS) Seq(
            "forecast_lower" -> lit(math.max(fProb - fQ, 0.0)),
            "forecast_upper" -> lit(math.min(fProb + fQ, 1.0)))
          else Seq(
            // conformal: false → maximal-uncertainty constants
            // (builtins.md documented behavior)
            "forecast_lower" -> lit(0.0),
            "forecast_upper" -> lit(1.0)))

      case OpForecast(params) =>
        // `.forecast(...)` on a sequence: truncate to the PREFIX
        // (everything but the final step) — the live partial matches —
        // and annotate each with the completion probability of the
        // final step from an order-1 transition model fit on the full
        // event stream (pst/: batch surrogate of the online PST;
        // f1..f5 carry the deeper models). Builtins attached:
        // forecast_probability/_confidence/_count/_state/_time/
        // _expected_time.
        val pm = params.toMap
        val horizonUs = pm.get("horizon") match {
          case Some(VDur(us)) => us
          case _              => 3600000000L
        }
        // builtins.md "Forecast Modes": preset bundles overridable by
        // explicit params (shared forecastParams bundle). `warmup` is
        // accepted but inert here — a batch fit has seen the complete
        // history, so the cold-start gate it exists for has nothing
        // to gate (the reference's adaptive warmup is likewise a
        // streaming-only concern). Hawkes modulation engages when
        // asked for explicitly or by accurate mode; balanced's is
        // neutral (~1.0 at normal rates, builtins.md) so bare
        // `.forecast()` stays a pure PST read. `confidence:` (minimum
        // probability to emit, forecasting-tutorial.md) applies only
        // when set: bare .forecast() annotates ALL live prefixes, the
        // analytic-completeness default.
        val (_, fDepthCap, fConformal, fHawkes, fMinProb) =
          forecastParams(pm)
        seq match {
          case Some(st) if st.steps.size >= 2 =>
            val finalStep = st.steps.last
            st.steps.remove(st.steps.size - 1)
            st.ghosts += finalStep.alias
            val lastPrefix = st.steps.last
            // per-entity ordering for the model: the key fields the
            // steps correlate on (`field == alias.field`)
            val keyFields = st.steps.flatMap(_.where).flatMap(conjuncts)
              .collect {
                case VBin("==", VRef(f), VField(_, f2)) if f == f2 => f
                case VBin("==", VField(_, f2), VRef(f)) if f == f2 => f
              }.distinct
            materializeSeq()
            val all0 = source.allEvents
            val keyCol = keyFields.headOption.flatMap { k =>
              if (all0.columns.contains(k)) Some(col(k))
              else if (all0.columns.contains("fields"))
                Some(element_at(col("fields"), k))
              else None
            }
            val all = keyCol.map(kc => all0.withColumn("__fk", kc))
              .getOrElse(all0)
            // variable-order PST (pst/ longest-suffix lookup): the
            // partial match's context IS the prefix type sequence, so
            // the deepest matching context is known statically — take
            // the longest suffix of the prefix types the model has
            // seen (order-1 is the depth-1 fallback)
            val prefixTypes = st.steps.map(_.eventType)
            val maxDepth = math.min(prefixTypes.size, fDepthCap)
            val pst = graft.cep.Forecast.pstScores(all,
              maxDepth = maxDepth,
              typeCol = "event_type",
              partitionKeys = if (keyCol.isDefined) Seq("__fk") else Nil,
              orderCol = "event_id")
              .filter(col("nxt") === finalStep.eventType)
            val candidates = (maxDepth to 1 by -1).map(k =>
              col("depth") === k &&
                col("context") === prefixTypes.takeRight(k).mkString(">"))
            val model = pst.filter(candidates.reduce(_ || _))
              .orderBy(col("depth").desc).limit(1)
              .select(col("prob").as("__f_prob"), col("cnt").as("__f_cnt"),
                col("depth").as("__f_depth"))
            df = df.join(broadcast(model), lit(true), "left")
            df = df
              .withColumn("forecast_probability",
                coalesce(col("__f_prob"), lit(0.0)))
            // Hawkes burst modulation (builtins.md: probability boosted
            // up to 5x during temporal bursts; hawkes.rs adaptive EMA
            // estimation): boost factor of the last PREFIX event joins
            // by event id and multiplies the completion probability,
            // clamped to 1.0
            if (fHawkes) {
              val boost = graft.cep.Forecast.hawkesIntensityAdaptive(
                all,
                partitionKeys = if (keyCol.isDefined) Seq("__fk") else Nil,
                tsCol = "ts", orderCol = "event_id")
                .select(col("event_id").as("__hb_id"),
                  col("boost_factor").as("__hb"))
              // plain equi-join on the event id: the boost table is
              // per-EVENT (stream-sized), so it must never carry a
              // broadcast hint — AQE picks the strategy
              df = df.join(boost,
                  col(s"${lastPrefix.alias}__event_id") === col("__hb_id"),
                  "left")
                .withColumn("forecast_probability",
                  least(col("forecast_probability") *
                    coalesce(col("__hb"), lit(1.0)), lit(1.0)))
                .drop("__hb_id", "__hb")
            }
            df = df
              .withColumn("forecast_count",
                coalesce(col("__f_cnt"), lit(0L)))
              // support-based stability: 0 with no observations,
              // →1 as transition evidence accumulates (batch stand-in
              // for the reference's online confidence score)
              .withColumn("forecast_confidence",
                lit(1.0) - lit(1.0) /
                  (lit(1.0) + col("forecast_count").cast("double")))
              .withColumn("forecast_state",
                lit(st.steps.map(_.eventType).mkString(">")))
              .withColumn("forecast_time", timestamp_micros(
                unix_micros(col(s"${lastPrefix.alias}__ts")) + horizonUs))
              // conformal interval (pst/conformal.rs; builtins.md
              // forecast_lower/_upper). The matched context induces a
              // TWO-POINT nonconformity distribution: residual 1−p
              // with mass p (completions) and residual p with mass
              // 1−p (non-completions), so the trailing-window q90 the
              // reference tracks online has a closed form: the larger
              // residual unless one side holds ≥90% of the mass.
              // f5_conformal carries the windowed-quantile realization
              // of the same machinery under an oracle.
              .withColumn("__f_q",
                when(col("forecast_probability") <= 0.1,
                  col("forecast_probability"))
                  .when(col("forecast_probability") >= 0.9,
                    lit(1.0) - col("forecast_probability"))
                  .otherwise(greatest(col("forecast_probability"),
                    lit(1.0) - col("forecast_probability"))))
              .withColumn("forecast_lower",
                greatest(col("forecast_probability") - col("__f_q"), lit(0.0)))
              .withColumn("forecast_upper",
                least(col("forecast_probability") + col("__f_q"), lit(1.0)))
              .withColumn("forecast_context_depth",
                coalesce(col("__f_depth"), lit(0)).cast("int"))
              .drop("__f_prob", "__f_cnt", "__f_depth", "__f_q")
            if (!fConformal) df = df
              // conformal: false → maximal-uncertainty constants
              .withColumn("forecast_lower", lit(0.0))
              .withColumn("forecast_upper", lit(1.0))
            fMinProb.foreach { p =>
              df = df.filter(col("forecast_probability") >= p)
            }
            df = df.withColumn("forecast_expected_time", col("forecast_time"))
            extraCols ++= Set("forecast_probability", "forecast_confidence",
              "forecast_count", "forecast_state", "forecast_time",
              "forecast_expected_time", "forecast_lower", "forecast_upper",
              "forecast_context_depth")
          case _ =>
            // re-forecasting a merged alert stream has no pattern
            // context in the batch realization — attach neutral
            // builtins so the pipeline stays runnable
            df = df
              .withColumn("forecast_probability", lit(0.0))
              .withColumn("forecast_confidence", lit(0.0))
              .withColumn("forecast_count", lit(0L))
              .withColumn("forecast_state", lit(""))
              .withColumn("forecast_time",
                if (df.columns.contains("ts")) timestamp_micros(
                  unix_micros(col("ts")) + horizonUs)
                else lit(null).cast("timestamp"))
              // no model context: maximal-uncertainty interval
              .withColumn("forecast_lower", lit(0.0))
              .withColumn("forecast_upper", lit(1.0))
              .withColumn("forecast_context_depth", lit(0))
            df = df.withColumn("forecast_expected_time", col("forecast_time"))
            extraCols ++= Set("forecast_probability", "forecast_confidence",
              "forecast_count", "forecast_state", "forecast_time",
              "forecast_expected_time", "forecast_lower", "forecast_upper",
              "forecast_context_depth")
        }

      case OpPattern(_, body) =>
        // `.pattern(name: events => events.len() CMP k)` — windowed
        // match count over the current partition/window
        val (cmpOp, threshold) = inlineFns(body) match {
          case VLambda(Seq(p), VBin(op, VMethod(VRef(q), "len", Nil), rhs))
              if p == q && Set("==", "!=", "<", "<=", ">", ">=")(op) =>
            (op, rhs)
          case other =>
            throw VplCompileError(s"unsupported pattern lambda: $other")
        }
        df = EventStream(df, keys = keys, win = win)
          .aggregate("match_count" -> count(lit(1)))
        val thr = translate(threshold, ExprCtx(_ => None, (_, _) => None))
        df = df.filter(cmpOp match {
          case "==" => col("match_count") === thr
          case "!=" => col("match_count") =!= thr
          case "<"  => col("match_count") < thr
          case "<=" => col("match_count") <= thr
          case ">"  => col("match_count") > thr
          case ">=" => col("match_count") >= thr
        })
        aggregated = true

      case OpOrderBy(items) =>
        val c = ctx
        df = df.orderBy(items.map { case (e, asc) =>
          val tc = translate(e, c); if (asc) tc.asc else tc.desc
        }: _*)
      case OpLimit(n) => df = df.limit(n.toInt)
      case OpDistinct(cols) =>
        df = if (cols.isEmpty) df.distinct()
        else df.select(cols.map(col): _*).distinct()

      case OpEmit(args, _) if streaming && streamSeq.isDefined =>
        df = buildStreamSeq(streamSeq.get.toSeq, args)
        finished = true

      case OpEmit(args, _) if batchKleeneDecl.isDefined =>
        df = buildBatchKleene(batchKleeneDecl.get, args)
        finished = true

      case OpEmit(args, _) =>
        materializeSeq()
        applyJoinWindow()
        settleType()
        // stateless streaming emit: the sentinel served the watermark;
        // it must not surface as an output row
        if (streaming && !aggregated && df.columns.contains("event_type"))
          df = df.filter(col("event_type") =!= "__sentinel")
        if (!aggregated && win.isDefined &&
          (pendingAggWhere.nonEmpty ||
            args.exists(a => containsAgg(inlineFns(a._2))))) {
          // windowed emit with agg calls but no explicit .aggregate
          // (GoldenCross): aggregate emit args + deferred where
          // predicates together, filter, project
          val items = args ++ pendingAggWhere.zipWithIndex.map {
            case (e, i) => s"__w_$i" -> e
          }
          runAgg(items)
          pendingAggWhere.indices.foreach(i =>
            df = df.filter(col(s"__w_$i")))
          df = df.select(args.map(a => col(a._1)): _*)
        } else if (args.nonEmpty) {
          val c = ctx
          val emitted = args.map(_._1).toSet
          // carry event time / arrival order as hidden columns so a
          // downstream stream can window/sequence over this one even
          // when the emit drops them (hvac CascadeFailure); stripped
          // from public outputs, renamed back by resolveAny
          val hiddenTs =
            if (emitted("ts")) None
            else c.bare("ts")
              // windowed aggregates carry win_start instead
              .orElse(c.bare("win_start").map(timestamp_seconds))
              .map(_.as("__hidden_ts"))
          val hiddenEid =
            if (emitted("event_id")) None
            else c.bare("event_id").map(_.as("__hidden_event_id"))
          val extras = hiddenTs.toSeq ++ hiddenEid.toSeq
          df = df.select(args.map { case (n, e) =>
            translate(e, c).as(n) } ++ extras: _*)
        }
        finished = true

      case other => throw VplCompileError(s"unsupported op in batch compile: $other")
    }
    if (!finished && seq.isDefined) materializeSeq()
    // bound `.to(Conn)` sinks receive the stream's final frame (the
    // batch flavor of the reference's sink wiring); unbound ones are
    // no-ops so programs compile without live brokers. A per-op
    // `topic:`/`subject:`/`channel:`/`index:` param re-aims the bound
    // connector (01_filter.vpl: `.to(Broker, topic: "bench-01-output")`).
    s.ops.collect { case OpTo(c2, ps) => (c2, opTarget(ps)) }.distinct
      .foreach { case (c2, target) =>
        sinks.get(c2).foreach(conn =>
          target.fold(conn)(conn.withTarget).write(stripHidden(df)))
      }
    df
  }

  /** The target override of a `.from`/`.to` op's params. */
  private def opTarget(ps: Seq[(String, VExpr)]): Option[String] =
    Seq("topic", "subject", "channel", "index").flatMap { k =>
      ps.collectFirst { case (kk, VStr(v)) if kk == k => v }
    }.headOption

  /** Base DataFrame of a connector-bound head stream: the connector's
    * landing dir read under the event declaration's schema (inherited
    * fields included), normalized to the VplSource.resolve contract —
    * event_id, ts, payload fields. Rows without their own `ts` get
    * arrival-order synthetic event time.
    */
  private def boundSource(conn0: graft.sources.Connector,
      ps: Seq[(String, VExpr)], eventType: String): DataFrame = {
    import org.apache.spark.sql.types._
    val conn = opTarget(ps).fold(conn0)(conn0.withTarget)
    val spark = source.allEvents.sparkSession
    def fieldsOf(e: VEvent): Seq[(String, String)] =
      e.parent.flatMap(pn => program.events.find(_.name == pn))
        .map(fieldsOf).getOrElse(Nil) ++ e.fields
    val schema = program.events.find(_.name == eventType).map { e =>
      val declared = fieldsOf(e).filter(_._1 != "ts").map { case (f, t) =>
        StructField(f, t.stripSuffix("?") match {
          case "int"       => LongType
          case "float"     => DoubleType
          case "bool"      => BooleanType
          case "timestamp" => TimestampType
          case _           => StringType
        })
      }
      StructType(declared :+ StructField("ts", TimestampType))
    }
    // streaming mode tails the landing dir through the connector's
    // file-stream read (unbounded micro-batches); batch mode snapshots
    // it. Streaming needs the declared schema (file streams cannot
    // infer), so undeclared event types are batch-bound-only.
    val raw =
      if (streaming)
        conn.readStream(spark, schema.getOrElse(throw VplCompileError(
          s"streaming .from($eventType) needs an `event $eventType:` " +
            "declaration (file streams cannot infer a schema)")))
      else conn.read(spark, schema)
    // synthetic event time for rows without their own ts: batch uses
    // arrival order (deterministic); streaming uses processing time —
    // the reference's kafka source also stamps arrival time
    // (monotonically_increasing_id is not available on streams).
    // Batch arrival order is (spool file name, in-file position):
    // every poller names its part files with a zero-padded arrival
    // sequence, and bare monotonically_increasing_id would follow
    // Spark's size-descending file packing instead — per-message
    // spools (MQTT/NATS/Redis land one file per message) scrambled
    // under it. The global row_number sort is the EventFile contract:
    // batch `.from` compiles serve replay/benchmark-scale landing
    // dirs; the unbounded path is the streaming arm or the
    // executor-parallel bindings.
    val arrivalCol = "__graft_arrival"
    val raw2 =
      if (streaming) raw
      else raw.withColumn(arrivalCol, row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          input_file_name(), monotonically_increasing_id()))
        .cast("long"))
    val synthTs =
      if (streaming) current_timestamp()
      else timestamp_micros(col(arrivalCol))
    val withTs =
      if (raw2.columns.contains("ts"))
        raw2.withColumn("ts", coalesce(col("ts").cast("timestamp"), synthTs))
      else raw2.withColumn("ts", synthTs)
    // event_id mirrors event time in BOTH arms: for synthetic ts this
    // is identical to the raw monotonic id (synthTs = timestamp_micros
    // of it), and for payload-carried ts it makes sequences ordered
    // consistently ACROSS topics — two `.from(conn, topic:)` sources
    // number independently, so a per-source monotonic id cannot order
    // a multi-topic SASE pattern (the reference sequences on arrival
    // time for the same reason). Payload timestamps are often coarse
    // (second/millisecond resolution), so bare unix_micros collides
    // for same-ts events and strict >/< sequence joins would silently
    // drop A-then-B pairs sharing a timestamp; spread ties at 1 µs
    // spacing in per-source arrival order (row_number partitioned by
    // the ts bucket — distributes on ts, no global sort). Exact and
    // unique while the tie count stays below the payload granularity
    // in µs (1e6 for second-resolution data); ids never change scale,
    // so downstream arithmetic (`.process` unroll) stays overflow-free.
    val withId =
      if (withTs.columns.contains("event_id")) withTs
      else if (streaming)
        // streams cannot window over monotonically_increasing_id; ts
        // there is either processing time (already distinct) or
        // payload time, where the micro-batch state machinery orders
        // ties by arrival within the batch
        withTs.withColumn("event_id", unix_micros(col("ts")))
      else {
        val arrivalInTie = row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("ts"))
            .orderBy(col(arrivalCol)))
        withTs.withColumn("event_id",
          unix_micros(col("ts")) + arrivalInTie.cast("long") - lit(1L))
      }
    val cleaned =
      if (withId.columns.contains(arrivalCol)) withId.drop(arrivalCol)
      else withId
    // the streaming machinery routes on event_type (the batch
    // resolve() contract pre-filters instead, so batch omits it)
    if (streaming && !cleaned.columns.contains("event_type"))
      cleaned.withColumn("event_type", lit(eventType))
    else cleaned
  }
}

object Vpl {
  /** Parse VPL text and compile every stream over an .evt file (or
    * several, concatenated in order).
    */
  def runEvt(spark: SparkSession, vplText: String,
      evtPaths: Seq[String],
      lookups: Map[String, DataFrame] = Map.empty): Map[String, Try[DataFrame]] = {
    val prog = VplParser.parse(vplText)
    val decls = prog.events.map(e => e.name -> e).toMap
    new VplCompiler(prog, new EvtSource(spark, evtPaths, decls),
      lookups = lookups).compileAll()
  }

  /** Parse VPL text and compile one stream against the events table.
    * `lookups` binds `.enrich` lookup frames (x7's path);
    * `sourceConns` binds live connectors — an `.enrich` aimed at a
    * bound [[graft.sources.HttpConnector]] then resolves its lookup
    * from the endpoint itself (x10's path).
    */
  def tableStream(spark: SparkSession, dir: String, vplText: String,
      streamName: String): DataFrame =
    tableStreamConns(spark, dir, vplText, streamName, Map.empty)

  /** [[tableStream]] with `.enrich` lookup-frame bindings. */
  def tableStream(spark: SparkSession, dir: String, vplText: String,
      streamName: String, lookups: Map[String, DataFrame]): DataFrame = {
    val prog = VplParser.parse(vplText)
    new VplCompiler(prog, new TableSource(spark, dir), lookups = lookups)
      .stream(streamName)
  }

  /** [[tableStream]] with live connector bindings. */
  def tableStreamConns(spark: SparkSession, dir: String, vplText: String,
      streamName: String,
      sourceConns: Map[String, graft.sources.Connector]): DataFrame = {
    val prog = VplParser.parse(vplText)
    new VplCompiler(prog, new TableSource(spark, dir),
      sourceConns = sourceConns).stream(streamName)
  }

  /** TRUE-STREAMING run of a VPL stream over its .evt scenario: the
    * file is staged one file per BATCH group ([[graft.sources
    * .EventReplay]]), read as a Structured Streaming source (one
    * micro-batch per BATCH), compiled in streaming mode (`.watermark`
    * → withWatermark, windows close by event time), run to a memory
    * sink in append mode, and the finalized rows returned. The staged
    * end-of-stream sentinel flushes the last windows; rows whose
    * watermark never closed (none, with the sentinel) would be absent
    * — exactly the reference's timed-replay semantics.
    */
  def runEvtStreaming(spark: SparkSession, vplText: String,
      evtPath: String, streamName: String): DataFrame = {
    val prog = VplParser.parse(vplText)
    val decls = prog.events.map(e => e.name -> e).toMap
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vpl_stream_").toString
    val staged = graft.sources.EventReplay.stage(spark, evtPath, dir)
    val df = new VplCompiler(prog,
      new StreamingEvtSource(spark, staged, decls), streaming = true)
      .stream(streamName)
    val qn = s"graft_vpl_stream_${streamName.toLowerCase}"
    spark.sql(s"DROP VIEW IF EXISTS $qn")
    val q = df.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(qn)
  }
}
