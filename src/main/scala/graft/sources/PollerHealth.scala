package graft.sources

/** Common health surface of the six driver-side ingestion loops
  * (Kafka/Kinesis/MQTT/NATS/Redis/REST) — the per-poller analogue of
  * the reference's managed-connector health registry
  * (crates/varpulis-runtime/src/connector/managed_registry.rs:
  * restart counts, terminal state per connector). Each poller
  * already exposed its own counters; this trait normalizes them so
  * [[graft.metrics.GraftMetrics]] can surface one health row per
  * registered poller in the queryable `graft_metrics` view and the
  * Prometheus exposition.
  *
  * `deliveredCount` is the transport's natural delivery unit
  * (records for kafka/kinesis, messages for mqtt/nats/redis, polls
  * for REST). A poller with `isDead == true` has exhausted its
  * reconnect budget and will never grow its landing dir again —
  * the condition MalformedFrameSpec pins as loud, never silent.
  */
trait PollerHealth {
  /** Records/messages/polls delivered to the spool so far. */
  def deliveredCount: Long
  /** Malformed payloads skipped (0 where the transport can't see them). */
  def healthFailures: Long = 0L
  /** Reconnects/restarts survived (0 where the loop has no reconnect). */
  def healthReconnects: Long = 0L
  /** The exception that killed the loop, None while healthy. */
  def terminalError: Option[Throwable]
  /** True once the loop is permanently dead (terminal error set). */
  def isDead: Boolean
}
