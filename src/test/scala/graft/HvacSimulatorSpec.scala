package graft

import org.apache.spark.sql.functions._

import graft.sources.HvacSimulator
import graft.sources.HvacSimulator._

/** Pins the simulator twin to simulator.rs behavior: default config,
  * per-tick event mix (temperature every tick per zone, humidity
  * every 3rd, status every 5th), draw ranges, anomaly rate,
  * degradation drift — plus the determinism the reference never had
  * (its RNG seeds from entropy) and the live rate-source stream.
  */
class HvacSimulatorSpec extends SparkSpec {

  test("default config mirrors simulator.rs defaults") {
    val c = defaultConfig
    assert(c.zones.map(_.id) == Seq("zone_a", "zone_b", "zone_c"))
    assert(c.zones.head.name == "Bureaux" && c.zones.head.targetTemp == 22.0)
    assert(c.hvacUnits == Seq(HvacConfig("cta_main", 15.0, 8.5)))
    assert(c.eventsPerSecond == 10 && c.anomalyProbability == 0.01 &&
      !c.degradationEnabled)
  }

  test("event mix: temperature per tick per zone, humidity every 3rd, status every 5th") {
    val df = ticks(spark, 300).cache()
    try {
      val byType = df.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType("temperature") == 300L * 3)
      assert(byType("humidity") == 100L * 3)
      assert(byType("hvac_status") == 60L)
      // sensor naming per simulator.rs format strings
      val sensors = df.select("sensor_id").distinct().collect()
        .map(_.getString(0)).toSet
      assert(sensors == Set(
        "zone_a_temp_01", "zone_b_temp_01", "zone_c_temp_01",
        "zone_a_hum_01", "zone_b_hum_01", "zone_c_hum_01", "cta_main"))
    } finally { df.unpersist(); () }
  }

  test("draw ranges match the reference distributions (1% anomaly default)") {
    val df = ticks(spark, 1000).cache()
    try {
      for (z <- defaultConfig.zones) {
        // temps: either within ±variance (normal) or in [+5,+10) (spike)
        val bad = df.where(col("event_type") === "temperature" &&
          col("zone") === z.id &&
          !(abs(col("value") - z.targetTemp) <= z.tempVariance) &&
          !(col("value") >= z.targetTemp + 5.0 &&
            col("value") < z.targetTemp + 10.0)).count()
        assert(bad == 0L, s"${z.id} temperature out of both bands")
        val humBad = df.where(col("event_type") === "humidity" &&
          col("zone") === z.id &&
          abs(col("value") - z.targetHumidity) > z.humidityVariance).count()
        assert(humBad == 0L, s"${z.id} humidity out of band")
      }
      val st = df.where(col("event_type") === "hvac_status")
      assert(st.where(col("fan_speed") < 1150 || col("fan_speed") > 1250)
        .count() == 0L)
      assert(st.where(abs(col("power_consumption") - 15.0) > 0.5).count() == 0L)
      assert(st.where(abs(col("compressor_pressure") - 8.5) > 0.1).count() == 0L)
    } finally { df.unpersist(); () }
  }

  test("anomaly scenario: ~10% of temperatures spike into [target+5, target+10)") {
    val df = ticks(spark, 2000, anomalyConfig)
    val z = defaultConfig.zones.head
    val temps = df.where(col("event_type") === "temperature" &&
      col("zone") === z.id)
    val n = temps.count()
    val spikes = temps.where(col("value") >= z.targetTemp + 5.0).count()
    assert(n == 2000L)
    val rate = spikes.toDouble / n
    assert(rate > 0.06 && rate < 0.14, s"anomaly rate $rate not ~0.10")
  }

  test("degradation scenario: power drifts up, pressure drifts down (0.0001/tick)") {
    val df = ticks(spark, 20000, degradationConfig)
      .where(col("event_type") === "hvac_status")
    val early = df.where(col("tick") <= 1000)
      .agg(avg("power_consumption"), avg("compressor_pressure")).collect()(0)
    val late = df.where(col("tick") > 19000)
      .agg(avg("power_consumption"), avg("compressor_pressure")).collect()(0)
    // factor grows ~1.0→3.0 over 20k ticks: power ≈ 15·f, pressure ≈ 8.5/f
    assert(late.getDouble(0) > early.getDouble(0) + 20.0,
      s"power ${early.getDouble(0)} -> ${late.getDouble(0)}")
    assert(late.getDouble(1) < early.getDouble(1) / 2.0,
      s"pressure ${early.getDouble(1)} -> ${late.getDouble(1)}")
  }

  test("runs are exactly reproducible given a seed; seeds decorrelate") {
    val a = ticks(spark, 100).orderBy("tick", "event_type", "sensor_id")
      .collect().toSeq
    val b = ticks(spark, 100).orderBy("tick", "event_type", "sensor_id")
      .collect().toSeq
    assert(a == b, "same seed must reproduce bit-identically")
    val c = ticks(spark, 100, defaultConfig.copy(seed = 7L))
      .orderBy("tick", "event_type", "sensor_id").collect().toSeq
    assert(a != c, "different seed must give different draws")
  }

  test("the rate-source stream produces the same mix live") {
    val q = HvacSimulator.stream(spark,
      defaultConfig.copy(eventsPerSecond = 100))
      .writeStream.format("memory").queryName("graft_hvac_sim")
      .outputMode("append").start()
    try {
      val deadline = System.nanoTime() + 20L * 1000000000L
      var types = Set.empty[String]
      while (types.size < 3 && System.nanoTime() < deadline) {
        Thread.sleep(250)
        types = spark.table("graft_hvac_sim").select("event_type")
          .distinct().collect().map(_.getString(0)).toSet
      }
      assert(types == Set("temperature", "humidity", "hvac_status"),
        s"live mix incomplete after 20s: $types")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_hvac_sim")
      ()
    }
  }
}
