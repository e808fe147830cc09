package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SASE+ sequence detection — the true-streaming twin of
  * [[graft.cep.SeqPattern]] (reference NFA:
  * crates/varpulis-runtime/src/sase.rs; runs/partial matches per key,
  * time-bounded by `within`).
  *
  * Realized with `flatMapGroupsWithState` keyed on the partition key:
  * state = the set of live partial matches (NFA runs), events advance
  * runs in arrival order, completed runs emit immediately, expired
  * runs are evicted by event time. Semantics = skip-till-any-match,
  * identical to the batch join compiler — the spec asserts the two
  * paths agree on the same data.
  *
  * Scale: state lives in the state store, partitioned by key; per-key
  * state is bounded by `maxRuns` (the reference's limits.rs plays the
  * same role) plus event-time expiry, so no key can grow unboundedly.
  */
object PatternStream {

  final case class Ev(
      event_id: Long, user_id: Long, event_type: String,
      value: Double, ts_us: Long)

  final case class Run(stepIdx: Int, firstTsUs: Long, ids: List[Long])
  final case class NfaState(runs: List[Run])
  final case class Match(user_id: Long, ids: Seq[Long], span_us: Long)

  /** A sequence step: event-type to match (value predicates could be
    * added per-step; type match is what the verified queries need).
    */
  final case class StepSpec(eventType: String)

  def detect(
      events: Dataset[Ev],
      steps: Seq[StepSpec],
      withinUs: Long,
      maxRuns: Int = 10000)(implicit spark: SparkSession): Dataset[Match] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[NfaState, Match](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[NfaState]) =>
          var runs = state.getOption.map(_.runs).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[Match]
          // arrival order = event_id order (micro-batch may be unordered)
          val batch = it.toArray.sortBy(_.event_id)
          for (ev <- batch) {
            // evict expired runs first (event-time bound)
            runs = runs.filter(r => ev.ts_us - r.firstTsUs <= withinUs)
            // advance every run whose next step matches (skip-till-any:
            // the run also stays alive for later alternatives)
            val advanced = runs.flatMap { r =>
              if (r.stepIdx + 1 < steps.size &&
                steps(r.stepIdx + 1).eventType == ev.event_type &&
                ev.ts_us - r.firstTsUs <= withinUs) {
                val nr = Run(r.stepIdx + 1, r.firstTsUs, ev.event_id :: r.ids)
                if (nr.stepIdx == steps.size - 1) {
                  out += Match(user, nr.ids.reverse, ev.ts_us - nr.firstTsUs)
                  None // completed runs don't persist
                } else Some(nr)
              } else None
            }
            runs = runs ++ advanced
            // new run from step 0
            if (steps.head.eventType == ev.event_type) {
              if (steps.size == 1) out += Match(user, Seq(ev.event_id), 0L)
              else runs = Run(0, ev.ts_us, List(ev.event_id)) :: runs
            }
            if (runs.size > maxRuns) runs = runs.take(maxRuns)
          }
          state.update(NfaState(runs))
          out.iterator
      }
  }
}
