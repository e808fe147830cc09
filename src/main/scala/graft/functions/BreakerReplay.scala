package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Circuit-breaker replay over a connector's delivery-outcome
  * timeline (reference: varpulis-runtime/src/circuit_breaker.rs —
  * the standard three-state breaker guarding sink connectors).
  *
  * The reference breaker decides in wall-clock time as deliveries
  * happen; the data-plane equivalent replays the same state machine
  * in EVENT time over the logged outcomes, so the decision each event
  * WOULD have received is reproducible and oracle-checkable:
  *
  *  - closed: attempt is `sent`; a failure bumps the consecutive
  *    count, reaching `threshold` trips the breaker open (the
  *    tripping event itself was still attempted);
  *  - open: events inside `timeoutUs` of the trip are `rejected`
  *    without an attempt (the reference routes these to the DLQ) and
  *    do not touch breaker state;
  *  - the first event past the timeout is the half-open `probe`:
  *    success closes the breaker, failure re-opens it from that
  *    event's time.
  *
  * One native O(n) pass per connector group (same shape as
  * [[GretaDp]]): input array<struct<event_id:long, ts_us:long,
  * ok:boolean>> sorted by event_id; output one struct per event
  * (event_id, decision 0=sent/1=rejected/2=probe, state-after
  * 0=closed/1=open). Consecutive-failure count resets on open, like
  * the reference's transition to Open.
  */
object BreakerReplayUtil {

  /** Breaker state between events; see the state machine above. */
  final case class BkState(open: Boolean, consec: Int, openedUs: Long)
  val Initial: BkState = BkState(open = false, consec = 0, openedUs = 0L)

  /** One state-machine step — the single source of truth shared by
    * the batch expression below and the streaming twin
    * (StreamingQueries.streamBreaker), so the two paths cannot
    * diverge. Returns (decision 0=sent/1=rejected/2=probe, state').
    */
  def step(s: BkState, us: Long, ok: Boolean, threshold: Int,
      timeoutUs: Long): (Int, BkState) =
    if (s.open) {
      if (us < s.openedUs + timeoutUs) (1, s) // rejected, no attempt
      else if (ok) (2, BkState(open = false, consec = 0, openedUs = 0L))
      else (2, BkState(open = true, consec = 0, openedUs = us))
    } else if (ok) (0, BkState(open = false, consec = 0, openedUs = 0L))
    else if (s.consec + 1 >= threshold)
      (0, BkState(open = true, consec = 0, openedUs = us))
    else (0, s.copy(consec = s.consec + 1))

  def replay(evs: ArrayData, threshold: Int, timeoutUs: Long): ArrayData = {
    val n = evs.numElements()
    val out = new Array[Any](n)
    var s = Initial
    var i = 0
    while (i < n) {
      val st = evs.getStruct(i, 3)
      val id = st.getLong(0)
      val us = st.getLong(1)
      val ok = st.getBoolean(2)
      val (dec, s2) = step(s, us, ok, threshold, timeoutUs)
      s = s2
      out(i) = new GenericInternalRow(
        Array[Any](id, dec, if (s.open) 1 else 0))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BreakerReplay(child: Expression, threshold: Int, timeoutUs: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("dec", IntegerType, nullable = false),
    StructField("state", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "breaker_replay"

  override protected def nullSafeEval(input: Any): Any =
    BreakerReplayUtil.replay(input.asInstanceOf[ArrayData], threshold, timeoutUs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BreakerReplayUtil.replay($c, $threshold, ${timeoutUs}L)")

  override protected def withNewChildInternal(newChild: Expression): BreakerReplay =
    copy(child = newChild)
}
