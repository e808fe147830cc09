package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** SASE+ pattern matching, batch realization.
  *
  * The reference implements SASE+ (Wu/Diao/Rizvi, SIGMOD'06) as an NFA
  * over a live stream (crates/varpulis-runtime/src/sase.rs). On Spark
  * batch data the same semantics are better expressed as declarative
  * relational plans so Catalyst can push filters into the scans and
  * pick join strategies:
  *
  *  - sequence `A -> B -> C within d` (skip-till-any-match: every
  *    combination of events in order within the time bound) = a chain
  *    of equi-joins on the partition key with time-range predicates;
  *  - negation `A -> NOT(B) within d` = left-anti time-range join;
  *  - `AND(A, B) within d` = symmetric |Δt| ≤ d join;
  *  - `OR(A, B)` = disjunctive filter;
  *  - earliest-match (the reference's non-greedy first-match policy)
  *    = an as-of join, realized with a single window-function pass
  *    (one shuffle) rather than join+re-aggregate.
  *
  * Event order is the unique, time-consistent `orderCol` (arrival
  * order in the reference engine); `within` bounds are on event time.
  *
  * Scale: all joins are equi-joins on the partition key (user_id...),
  * so a 1000-executor cluster shuffles each filtered step input once
  * by that key; range predicates evaluate post-shuffle. Steps are
  * filtered before the shuffle (predicate pushdown to the scan).
  * The streaming NFA twin lives in [[graft.streaming.PatternStream]].
  */
final case class Step(
    alias: String,
    pred: Column,
    /** extra per-transition time bound from the previous step, seconds */
    withinPrevSec: Option[Long] = None)

final case class SeqPattern(
    steps: Seq[Step],
    withinSec: Long,
    partitionKeys: Seq[String],
    tsCol: String = "ts",
    orderCol: String = "event_id",
    /** Split each join's left side into this many salt buckets so a
      * hot partition key (one user holding half the stream) fans out
      * across tasks instead of serializing into one. The right step
      * is replicated `buckets`× (it is the smaller, filtered side).
      * None = plain equi-join; AQE's skew-join handles sort-merge
      * plans at runtime, salting covers the rest and known-up-front
      * skew.
      */
    saltBuckets: Option[Int] = None) {

  private def prefixed(df: DataFrame, alias: String): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${alias}_$c"))

  private def us(c: Column): Column = unix_micros(c)

  /** All-matches (skip-till-any-match) compilation: fold of joins. */
  def compile(events: DataFrame, crossPreds: Seq[Column] = Nil): DataFrame = {
    require(steps.size >= 2, "sequence needs at least two steps")
    val stepDfs = steps.map(s => prefixed(events.filter(s.pred), s.alias))
    val first = steps.head.alias
    val joined = steps.sliding(2).zip(stepDfs.tail.iterator)
      .foldLeft(stepDfs.head) { case (acc, (Seq(prev, cur), curDf)) =>
        val keyEq = partitionKeys
          .map(k => col(s"${prev.alias}_$k") === col(s"${cur.alias}_$k"))
          .reduceOption(_ && _).getOrElse(lit(true))
        val ordered = col(s"${cur.alias}_$orderCol") > col(s"${prev.alias}_$orderCol")
        val windowBound =
          us(col(s"${cur.alias}_$tsCol")) - us(col(s"${first}_$tsCol")) <=
            lit(withinSec * 1000000L)
        val transitionBound = cur.withinPrevSec.map { d =>
          us(col(s"${cur.alias}_$tsCol")) - us(col(s"${prev.alias}_$tsCol")) <=
            lit(d * 1000000L)
        }.getOrElse(lit(true))
        val cond = keyEq && ordered && windowBound && transitionBound
        saltBuckets match {
          case Some(b) =>
            // deterministic row-spread salt on the left; right side
            // replicated once per salt — same result set, hot keys
            // hash to b shuffle partitions instead of one
            val l = acc.withColumn("__salt",
              pmod(spark_partition_id() + monotonically_increasing_id(),
                lit(b)).cast("int"))
            val r = curDf.withColumn("__salt_r",
              explode(sequence(lit(0), lit(b - 1))))
            l.join(r, cond && col("__salt") === col("__salt_r"))
              .drop("__salt", "__salt_r")
          case None => acc.join(curDf, cond)
        }
      }
    crossPreds.foldLeft(joined)((d, p) => d.filter(p))
  }

  /** Negation: prefix pattern followed by ABSENCE of `negStep` within
    * `withinSec` of the prefix's last event. Left-anti join keeps
    * prefix matches with no violating event (sase.rs NegationInfo /
    * StateType::Negation semantics: timeout fires the match).
    */
  def compileNegation(events: DataFrame, negStep: Step): DataFrame = {
    val anchorAlias = steps.last.alias
    val anchor =
      if (steps.size == 1) prefixed(events.filter(steps.head.pred), anchorAlias)
      else compile(events)
    val neg = prefixed(events.filter(negStep.pred), negStep.alias)
    val keyEq = partitionKeys
      .map(k => col(s"${anchorAlias}_$k") === col(s"${negStep.alias}_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val inWindow =
      col(s"${negStep.alias}_$orderCol") > col(s"${anchorAlias}_$orderCol") &&
        us(col(s"${negStep.alias}_$tsCol")) - us(col(s"${anchorAlias}_$tsCol")) <=
          lit(withinSec * 1000000L)
    anchor.join(neg, keyEq && inWindow, "left_anti")
  }
}

object Pattern {

  /** `AND(a, b) within d` — both events occur within d of each other,
    * any order (sase.rs StateType::And). Symmetric time-range join on
    * the partition key; self-pairs excluded.
    */
  def conjunction(
      events: DataFrame,
      a: Step, b: Step,
      withinSec: Long,
      partitionKeys: Seq[String],
      tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    def prefixed(df: DataFrame, alias: String): DataFrame =
      df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${alias}_$c"))
    val da = prefixed(events.filter(a.pred), a.alias)
    val db = prefixed(events.filter(b.pred), b.alias)
    val keyEq = partitionKeys
      .map(k => col(s"${a.alias}_$k") === col(s"${b.alias}_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val close = abs(
      unix_micros(col(s"${a.alias}_$tsCol")) -
        unix_micros(col(s"${b.alias}_$tsCol"))) <= lit(withinSec * 1000000L)
    val distinctPair =
      col(s"${a.alias}_$orderCol") =!= col(s"${b.alias}_$orderCol")
    da.join(db, keyEq && close && distinctPair)
  }

  /** `OR(a, b, ...)` — either matches (sase.rs StateType::Or): a
    * disjunctive filter, no join at all.
    */
  def disjunction(events: DataFrame, preds: Column*): DataFrame =
    events.filter(preds.reduce(_ || _))

  /** Kleene-plus detection `A -> B+ -> C within d`: one output row per
    * (A, C) anchor pair, aggregating the B-run between them (ids,
    * count, sum). The reference's detection mode enumerates each of
    * the 2^n−1 B-subsets as separate matches (sase.rs Kleene stack) —
    * on 100 TB that enumeration is exactly what GRETA/trend
    * aggregation exists to avoid, so the batch surface emits the
    * maximal run + aggregates (the enumerable subsets are derivable,
    * and [[TrendAggregate]] covers their counts in closed form).
    *
    * Plan shape: anchor-pair equi-join on the key, then one more
    * equi-join for the B events and a groupBy on the anchor pair —
    * all shuffles on (partition key) or (pair id), never a cross
    * product.
    */
  def kleeneBetween(
      events: DataFrame,
      a: Step, b: Step, c: Step,
      withinSec: Long,
      partitionKeys: Seq[String],
      bValueCol: String,
      tsCol: String = "ts",
      orderCol: String = "event_id",
      bCrossPred: Column = lit(true)): DataFrame = {
    val pairs = SeqPattern(Seq(a, c), withinSec, partitionKeys, tsCol, orderCol)
      .compile(events)
    def prefixed(df: DataFrame, alias: String): DataFrame =
      df.columns.foldLeft(df)((d, cc) => d.withColumnRenamed(cc, s"${alias}_$cc"))
    val bs = prefixed(events.filter(b.pred), b.alias)
    val keyEq = partitionKeys
      .map(k => col(s"${a.alias}_$k") === col(s"${b.alias}_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val between =
      col(s"${b.alias}_$orderCol") > col(s"${a.alias}_$orderCol") &&
        col(s"${b.alias}_$orderCol") < col(s"${c.alias}_$orderCol")
    // bCrossPred: GRETA-style anchored step predicate (`B where x >
    // first.x`) over the prefixed `{a.alias}_*` / `{b.alias}_*`
    // columns — part of the join condition, so the run set matches
    // the streaming NFA's per-arrival evaluation against the anchor
    pairs.join(bs, keyEq && between && bCrossPred)
      .groupBy(col(s"${a.alias}_$orderCol").as("a_id"),
        col(s"${c.alias}_$orderCol").as("c_id"))
      .agg(
        count(lit(1)).as("n_b"),
        min(col(s"${b.alias}_$orderCol")).as("first_b"),
        max(col(s"${b.alias}_$orderCol")).as("last_b"),
        sum(col(s"${b.alias}_$bValueCol").cast("decimal(14,2)"))
          .cast("double").as("sum_b"))
  }

  /** Kleene-star detection `A -> B* -> C within d` (sase.rs
    * StateType::Kleene with skip states, sase.rs:452-474): like
    * [[kleeneBetween]] but zero B's between the anchors is a valid
    * match — realized by turning the B attachment into a left outer
    * join, so an (A, C) pair with an empty B-run survives with
    * n_b = 0 and NULL run aggregates. Same shuffle shape as
    * kleene-plus: every join is an equi-join on the partition key.
    */
  def kleeneStarBetween(
      events: DataFrame,
      a: Step, b: Step, c: Step,
      withinSec: Long,
      partitionKeys: Seq[String],
      bValueCol: String,
      tsCol: String = "ts",
      orderCol: String = "event_id",
      bCrossPred: Column = lit(true)): DataFrame = {
    val pairs = SeqPattern(Seq(a, c), withinSec, partitionKeys, tsCol, orderCol)
      .compile(events)
    def prefixed(df: DataFrame, alias: String): DataFrame =
      df.columns.foldLeft(df)((d, cc) => d.withColumnRenamed(cc, s"${alias}_$cc"))
    val bs = prefixed(events.filter(b.pred), b.alias)
    val keyEq = partitionKeys
      .map(k => col(s"${a.alias}_$k") === col(s"${b.alias}_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val between =
      col(s"${b.alias}_$orderCol") > col(s"${a.alias}_$orderCol") &&
        col(s"${b.alias}_$orderCol") < col(s"${c.alias}_$orderCol")
    pairs.join(bs, keyEq && between && bCrossPred, "left_outer")
      .groupBy(col(s"${a.alias}_$orderCol").as("a_id"),
        col(s"${c.alias}_$orderCol").as("c_id"))
      .agg(
        count(col(s"${b.alias}_$orderCol")).as("n_b"),
        min(col(s"${b.alias}_$orderCol")).as("first_b"),
        max(col(s"${b.alias}_$orderCol")).as("last_b"),
        sum(col(s"${b.alias}_$bValueCol").cast("decimal(14,2)"))
          .cast("double").as("sum_b"))
  }

  /** Earliest-match sequence `A -> B within d` under the reference's
    * non-greedy first-match policy: for each A, the first B after it.
    *
    * Single-shuffle as-of join: union both filtered sides tagged,
    * sort within each partition key by arrival order, and take the
    * running minimum of future B events via a window frame — no
    * join, no re-aggregation. At 100 TB this is one shuffle on the
    * partition key instead of join + groupBy (two shuffles).
    */
  def earliestMatch(
      events: DataFrame,
      a: Step, b: Step,
      withinSec: Long,
      partitionKeys: Seq[String],
      carryB: Seq[String],
      tsCol: String = "ts",
      orderCol: String = "event_id"): DataFrame = {
    val da = events.filter(a.pred).withColumn("__side", lit(0))
    val db = events.filter(b.pred).withColumn("__side", lit(1))
    val all = da.unionByName(db)
    // Descending order + growing frame = incremental O(n) running min
    // per key (an unbounded-FOLLOWING frame would recompute per row).
    val w = W.partitionBy(partitionKeys.map(col): _*)
      .orderBy(col(orderCol).desc)
      .rowsBetween(W.unboundedPreceding, -1)
    // min of a struct ordered by orderCol == earliest future B
    val bStruct = when(col("__side") === 1,
      struct((col(orderCol).as("o") +: col(tsCol).as("t") +:
        carryB.map(c => col(c).as(c))): _*))
    val withNext = all.withColumn("__next_b", min(bStruct).over(w))
    withNext
      .filter(col("__side") === 0 && col("__next_b").isNotNull)
      .filter(
        unix_micros(col("__next_b.t")) - unix_micros(col(tsCol)) <=
          lit(withinSec * 1000000L))
  }
}
