package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Window specifications mirroring the reference's window kinds
  * (reference: crates/varpulis-runtime/src/window.rs — Tumbling l.15,
  * Sliding l.77, Count l.146, SlidingCount l.194, plus session windows
  * in tests/scenarios/checkpoint_session_window.vpl).
  *
  * Time windows are event-time and epoch-aligned (Spark `window()`
  * semantics); count windows are defined over a deterministic total
  * order given by `orderCol` (unique, time-consistent — e.g. event_id).
  */
sealed trait WindowSpec
final case class Tumbling(size: String) extends WindowSpec
final case class Sliding(size: String, slide: String) extends WindowSpec
final case class SessionWin(gap: String) extends WindowSpec
final case class CountWin(n: Int) extends WindowSpec
final case class SlidingCountWin(size: Int, slide: Int) extends WindowSpec

/** A VPL-style stream pipeline over a Spark DataFrame.
  *
  * Mirrors the reference's stream operator chain
  * (crates/varpulis-runtime/src/stream.rs): `.where() .select()
  * .partition_by() .window() .aggregate() .order_by() .limit()
  * .distinct() .emit()`, plus `merge` and `join`.
  *
  * Everything stays a declarative Catalyst plan: filters/projections
  * push down to the scan, aggregations get map-side partial
  * aggregation, joins pick broadcast vs shuffle via AQE. No
  * driver-side loops, no RDDs.
  *
  * @param df       underlying (lazy) DataFrame
  * @param tsCol    event-time column
  * @param orderCol unique, event-time-consistent ordering column
  *                 (arrival order in the reference)
  * @param keys     partition_by keys currently in effect
  * @param win      window currently in effect
  */
final case class EventStream(
    df: DataFrame,
    tsCol: String = "ts",
    orderCol: String = "event_id",
    keys: Seq[String] = Nil,
    win: Option[WindowSpec] = None) {

  def where(cond: Column): EventStream = copy(df = df.filter(cond))

  /** VPL `.select(name: expr, ...)` — projection with computed fields. */
  def select(cols: (String, Column)*): EventStream =
    copy(df = df.select(cols.map { case (n, c) => c.as(n) }: _*))

  /** VPL `.emit(...)` — terminal projection producing output events. */
  def emit(cols: (String, Column)*): DataFrame =
    df.select(cols.map { case (n, c) => c.as(n) }: _*)

  def partitionBy(cols: String*): EventStream = copy(keys = cols)

  def window(w: WindowSpec): EventStream = copy(win = Some(w))

  def orderBy(cols: Column*): EventStream = copy(df = df.orderBy(cols: _*))
  def limit(n: Int): EventStream = copy(df = df.limit(n))
  def distinct(): EventStream = copy(df = df.distinct())

  /** VPL `merge(...)` — union of homogeneous streams. */
  def merge(others: EventStream*): EventStream =
    copy(df = others.foldLeft(df)((acc, s) => acc.unionByName(s.df)))

  /** VPL `join(...).on(...)` — equi-join; broadcast small sides upstream. */
  def joinOn(other: DataFrame, cond: Column, how: String = "inner"): EventStream =
    copy(df = df.join(other, cond, how))

  /** VPL `.enrich(connector, key, fields, fallback)`
    * (reference: crates/varpulis-runtime/src/enrichment/) — batch
    * realization: broadcast lookup join + fallback defaults. The
    * lookup table plays the connector's reference-data role; at
    * cluster scale the dimension is broadcast so enrichment adds no
    * shuffle. Adds `enrich_status` ("ok"/"fallback") mirroring the
    * reference's enrich built-ins.
    */
  def enrich(
      lookup: DataFrame,
      keyCol: Column,
      lookupKey: String,
      fields: Seq[String],
      fallback: Map[String, Column] = Map.empty): EventStream = {
    val joined = df.join(broadcast(lookup), keyCol === lookup(lookupKey), "left")
    val probe = lookup(fields.head)
    val withStatus = joined.withColumn(
      "enrich_status", when(probe.isNull, lit("fallback")).otherwise(lit("ok")))
    val withFallbacks = fields.foldLeft(withStatus) { (d, f) =>
      fallback.get(f) match {
        case Some(default) => d.withColumn(f, coalesce(lookup(f), default))
        case None          => d
      }
    }
    copy(df = withFallbacks.drop(lookupKey))
  }

  /** Dead-letter fork (guardrail #50): rows failing a validation rule
    * leave the pipeline into the returned quarantine frame (with the
    * first failed rule's name as `error`) instead of poisoning it;
    * the stream continues on the clean side. Zero-exchange — both
    * sides are projections of one scan. See
    * [[graft.guard.Guardrails.deadLetterSplit]].
    */
  def deadLetter(rules: (String, Column)*): (EventStream, DataFrame) = {
    val (clean, dlq) = graft.guard.Guardrails.deadLetterSplit(df, rules)
    (copy(df = clean), dlq)
  }

  /** Per-key admission quota (guardrail #51): within each
    * (partition_by keys, event-time window) the first `maxPerWindow`
    * events by `orderCol` are admitted; the rest carry
    * `admitted = false`. See [[graft.guard.Guardrails.rateLimit]].
    */
  def rateLimit(maxPerWindow: Int, windowDur: String = "1 hour"): EventStream = {
    require(keys.size == 1,
      "rateLimit needs exactly one partition_by key (the quota subject)")
    copy(df = graft.guard.Guardrails.rateLimit(
      df, keys.head, tsCol, orderCol, maxPerWindow, windowDur))
  }

  /** VPL `.aggregate(name: fn(expr), ...)` over the current
    * partition_by keys and window. One shuffle on (keys, window);
    * partial aggregation happens map-side.
    */
  def aggregate(aggs: (String, Column)*): DataFrame = {
    val aggCols = aggs.map { case (n, c) => c.as(n) }
    win match {
      case None =>
        if (keys.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)

      case Some(Tumbling(size)) =>
        val g = keys.map(col) :+ org.apache.spark.sql.functions
          .window(col(tsCol), size).as("w")
        df.groupBy(g: _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .withColumn("win_start", col("w.start").cast("long"))
          .drop("w")

      case Some(Sliding(size, slide)) =>
        val g = keys.map(col) :+ org.apache.spark.sql.functions
          .window(col(tsCol), size, slide).as("w")
        df.groupBy(g: _*)
          .agg(aggCols.head, aggCols.tail: _*)
          .withColumn("win_start", col("w.start").cast("long"))
          .drop("w")

      case Some(SessionWin(gap)) =>
        val g = keys.map(col) :+ session_window(col(tsCol), gap).as("w")
        df.groupBy(g: _*)
          .agg(aggCols.head, aggCols.tail: _*)
          // µs-precision session start: sessions are defined by event
          // gaps, not epoch alignment, so expose exact start.
          .withColumn("sess_start_us",
            unix_micros(col("w.start")))
          .drop("w")

      case Some(CountWin(n)) =>
        // Deterministic row numbering per key → window id. Only full
        // windows emit (reference CountWindow semantics: emits when N
        // reached; trailing partial never fires — window.rs:146).
        val w = W.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
        df.withColumn("__rn", row_number().over(w))
          .withColumn("win_id", ((col("__rn") - 1) / n).cast("long"))
          .groupBy((keys.map(col) :+ col("win_id")): _*)
          .agg(aggCols.head, (aggCols.tail :+ count(lit(1)).as("__n")): _*)
          .filter(col("__n") === n)
          .drop("__n")

      case Some(SlidingCountWin(size, slide)) =>
        // Emits every `slide` events the aggregate of the last `size`
        // events (window.rs:194). Window-frame form: no self-join.
        val w = W.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
        val frame = w.rowsBetween(-(size - 1), 0)
        val rn = row_number().over(w)
        // `.over` lifts only a TOP-LEVEL aggregate; a cast-wrapped agg
        // (the decimal-exact sum) must have the frame applied INSIDE
        // the cast, or Spark plans the inner agg as a groupless
        // Aggregate (MISSING_GROUP_BY)
        def overFrame(c: Column): Column =
          org.apache.spark.sql.graftbridge.ColumnBridge.uncast(c) match {
            case Some((inner, dt)) => inner.over(frame).cast(dt)
            case None              => c.over(frame)
          }
        val framed = aggs.map { case (n, c) => overFrame(c).as(n) }
        df.select((keys.map(col) :+ col(orderCol)) ++ framed :+ rn.as("__rn"): _*)
          .filter(col("__rn") % slide === 0 && col("__rn") >= size)
          .drop("__rn")
    }
  }
}

object EventStream {
  /** Bind a stream to a source table with the conventional events
    * schema (VPL: `stream S = EventType.from(connector)`).
    */
  def events(df: DataFrame): EventStream = EventStream(df)

  /** Skew-salted equi-join: when `left`'s key distribution has hot
    * keys (one user with millions of events, one boilerplate doc
    * fingerprint), a plain shuffle join puts a whole hot key in one
    * task. Salting splits each left key into `buckets` subkeys and
    * replicates the right side once per salt — same join result, hot
    * keys fan out over `buckets` tasks. Use when AQE's skew handling
    * isn't available (non-sort-merge plans) or the skew is known
    * up front; `buckets` multiplies the right side's volume, so keep
    * it small and the right side lean.
    */
  def saltedJoin(
      lhs: DataFrame, rhs: DataFrame,
      leftKey: String, rightKey: String,
      buckets: Int,
      how: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions._
    val l = lhs.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets))
        .cast("int"))
    val r = rhs.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), how)
      .drop("__salt")
  }
}
