package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Checkpoint/recovery — the reference's persistence surface
  * (persistence.rs; tests/scenarios/checkpoint_*.vpl): a stopped
  * pipeline resumes from its checkpoint and processes only new data,
  * exactly once.
  */
class CheckpointSpec extends SparkSpec {

  test("streaming pipeline resumes from checkpoint, exactly once") {
    val src = Files.createTempDirectory("graft_ckp_src_").toString
    val out = Files.createTempDirectory("graft_ckp_out_").toString
    val chk = Files.createTempDirectory("graft_ckp_chk_").toString
    val events = Tables(spark, sf).events

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(events.schema).parquet(src)
        .filter(col("value") > 0)
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1
    events.filter(col("event_id") < 500).write.mode("append").parquet(src)
    runOnce()
    val n1 = spark.read.parquet(out).count()

    // phase 2: new files arrive while the pipeline is down
    events.filter(col("event_id") >= 500).write.mode("append").parquet(src)
    runOnce()

    val result = spark.read.parquet(out)
    val total = events.count()
    assert(n1 < total, "phase 1 processed a strict subset")
    assert(result.count() == total, "all events exactly once after resume")
    assert(result.select("event_id").distinct().count() == total,
      "no duplicates across the restart")
  }
}
