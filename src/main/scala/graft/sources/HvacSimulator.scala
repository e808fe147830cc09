package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HVAC building simulator — the reference's built-in demo/load
  * generator (`varpulis simulate`; varpulis-runtime/src/simulator.rs:
  * SimulatorConfig 3 zones + 1 unit, 10 ev/s default, temperature
  * every tick per zone, humidity every 3rd tick, HVAC status every
  * 5th, 1% anomaly spikes, optional linear degradation drift).
  *
  * Spark-first shape: the tick clock is Spark's `rate` streaming
  * source (rowsPerSecond = events_per_second — distributed,
  * backpressure-aware), and each tick expands to its event mix with
  * pure column arithmetic, so the generator runs inside whole-stage
  * codegen on executors — not a driver thread pushing rows through a
  * channel (the reference's mpsc shape does not scale past one core,
  * and a demo source that cannot saturate the engine undersells it).
  * [[ticks]] exposes the same expansion over a bounded batch range
  * for tests and .evt-style replay staging.
  *
  * Determinism: the reference seeds its RNG from entropy (values are
  * irreproducible by design); graft instead derives every draw from
  * `xxhash64(seed, tick, stream, field)` mapped to [0,1), so a run
  * is exactly reproducible given (seed, tick range) — the property
  * the test harness and any soak-run triage actually need. Draw
  * distributions mirror the reference: uniform ±variance around the
  * zone target, anomaly spike uniform in [5,10) above target,
  * status power/pressure jitter ±0.5/±0.1, fan 1200±50,
  * degradation_factor = 1 + 0.0001·tick (applied multiplicatively to
  * power, dividing pressure — simulator.rs:162-166).
  */
object HvacSimulator {

  final case class ZoneConfig(id: String, name: String, targetTemp: Double,
      targetHumidity: Double, tempVariance: Double, humidityVariance: Double)
  final case class HvacConfig(id: String, basePower: Double,
      basePressure: Double)
  final case class SimulatorConfig(
      zones: Seq[ZoneConfig],
      hvacUnits: Seq[HvacConfig],
      eventsPerSecond: Int,
      anomalyProbability: Double,
      degradationEnabled: Boolean,
      seed: Long)

  /** simulator.rs Default: Bureaux/Salle Serveurs/Accueil +
    * cta_main, 10 ev/s, 1% anomalies, no degradation.
    */
  val defaultConfig: SimulatorConfig = SimulatorConfig(
    zones = Seq(
      ZoneConfig("zone_a", "Bureaux", 22.0, 50.0, 1.0, 5.0),
      ZoneConfig("zone_b", "Salle Serveurs", 19.0, 50.0, 0.5, 3.0),
      ZoneConfig("zone_c", "Accueil", 21.0, 50.0, 2.0, 8.0)),
    hvacUnits = Seq(HvacConfig("cta_main", 15.0, 8.5)),
    eventsPerSecond = 10,
    anomalyProbability = 0.01,
    degradationEnabled = false,
    seed = 0L)

  /** create_anomaly_simulator: 10% anomaly rate. */
  def anomalyConfig: SimulatorConfig =
    defaultConfig.copy(anomalyProbability = 0.1)

  /** create_degradation_simulator: linear power/pressure drift. */
  def degradationConfig: SimulatorConfig =
    defaultConfig.copy(degradationEnabled = true)

  /** Uniform [0,1) draw from (seed, tick, tag): top 53 bits of
    * xxhash64 — codegen'd, identical on executors and in tests.
    */
  private def u01(cfg: SimulatorConfig, tick: Column, tag: String): Column =
    shiftrightunsigned(
      xxhash64(lit(cfg.seed), tick, lit(tag)), 11).cast("double") /
      lit((1L << 53).toDouble)

  private def uniform(cfg: SimulatorConfig, tick: Column, tag: String,
      lo: Double, hi: Double): Column =
    lit(lo) + u01(cfg, tick, tag) * lit(hi - lo)

  private def degradation(cfg: SimulatorConfig, tick: Column): Column =
    if (cfg.degradationEnabled) lit(1.0) + tick.cast("double") * lit(0.0001)
    else lit(1.0)

  /** Expand a frame bearing (`tick`: long, `ts`: timestamp) into the
    * simulator's event mix. Output schema (one row per event, the
    * union of the three reference structs):
    * event_type temperature|humidity|hvac_status, sensor_id, zone,
    * value, mode, power_consumption, fan_speed, compressor_pressure,
    * ts.
    */
  def expand(cfg: SimulatorConfig, ticksDf: DataFrame): DataFrame = {
    require(cfg.zones.nonEmpty, "simulator needs at least one zone")
    val tick = col("tick")
    val nullD = lit(null).cast("double")
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val temp = cfg.zones.map { z =>
      val anom = u01(cfg, tick, s"anom_${z.id}") < cfg.anomalyProbability
      val value = when(anom,
        lit(z.targetTemp) + uniform(cfg, tick, s"spike_${z.id}", 5.0, 10.0))
        .otherwise(lit(z.targetTemp) +
          uniform(cfg, tick, s"temp_${z.id}", -z.tempVariance, z.tempVariance))
      ticksDf.select(
        lit("temperature").as("event_type"),
        lit(s"${z.id}_temp_01").as("sensor_id"),
        lit(z.id).as("zone"),
        value.as("value"),
        nullS.as("mode"), nullD.as("power_consumption"),
        nullL.as("fan_speed"), nullD.as("compressor_pressure"),
        col("ts"), tick)
    }
    val hum = cfg.zones.map { z =>
      val value = lit(z.targetHumidity) + uniform(cfg, tick, s"hum_${z.id}",
        -z.humidityVariance, z.humidityVariance)
      ticksDf.where(tick % 3 === 0).select(
        lit("humidity").as("event_type"),
        lit(s"${z.id}_hum_01").as("sensor_id"),
        lit(z.id).as("zone"),
        value.as("value"),
        nullS.as("mode"), nullD.as("power_consumption"),
        nullL.as("fan_speed"), nullD.as("compressor_pressure"),
        col("ts"), tick)
    }
    val status = cfg.hvacUnits.map { h =>
      val deg = degradation(cfg, tick)
      ticksDf.where(tick % 5 === 0).select(
        lit("hvac_status").as("event_type"),
        lit(h.id).as("sensor_id"),
        nullS.as("zone"),
        nullD.as("value"),
        lit("cooling").as("mode"),
        (lit(h.basePower) * deg +
          uniform(cfg, tick, s"pow_${h.id}", -0.5, 0.5))
          .as("power_consumption"),
        (lit(1200L) + floor(uniform(cfg, tick, s"fan_${h.id}", -50.0, 50.0))
          .cast("long")).as("fan_speed"),
        (lit(h.basePressure) / deg +
          uniform(cfg, tick, s"prs_${h.id}", -0.1, 0.1))
          .as("compressor_pressure"),
        col("ts"), tick)
    }
    (temp ++ hum ++ status).reduce(_.unionByName(_))
  }

  /** Unbounded simulator stream: `rate` source at
    * `events_per_second` ticks/s (simulator.rs paces one
    * generate_events per interval tick), expanded on executors.
    */
  def stream(spark: SparkSession, cfg: SimulatorConfig = defaultConfig)
      : DataFrame =
    expand(cfg, spark.readStream.format("rate")
      .option("rowsPerSecond", cfg.eventsPerSecond.toString).load()
      .select((col("value") + 1).as("tick"), col("timestamp").as("ts")))

  /** Bounded batch form: ticks [1, nTicks], event time advancing one
    * tick interval per tick from `baseEpochMs` — for tests, demo
    * corpus generation, and .evt-style replay staging.
    */
  def ticks(spark: SparkSession, nTicks: Long,
      cfg: SimulatorConfig = defaultConfig,
      baseEpochMs: Long = EventReplay.DefaultBaseEpochMs): DataFrame = {
    // microsecond tick spacing: millisecond division truncates to 0
    // past 1000 ev/s (freezing event time) and drifts at rates like 3
    require(cfg.eventsPerSecond >= 1 && cfg.eventsPerSecond <= 1000000,
      s"eventsPerSecond ${cfg.eventsPerSecond} outside [1, 1e6]")
    val intervalUs = 1000000L / cfg.eventsPerSecond
    expand(cfg, spark.range(1, nTicks + 1).select(
      col("id").as("tick"),
      timestamp_micros(lit(baseEpochMs * 1000L) + (col("id") - 1) * intervalUs)
        .as("ts")))
  }
}
