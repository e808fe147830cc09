package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.ml.Score
import graft.sources.EventFile

/** `.score()` models and the .evt event-file source. */
class ScoreEventFileSpec extends SparkSpec {

  test("linear model and stub batch model produce calibrated scores") {
    val events = Tables(spark, sf).events.limit(200)
    val linear = Score.LinearModel("m", Map("value" -> 0.01), -0.8)
      .score(events).select("score").collect().map(_.getDouble(0))
    assert(linear.forall(s => s > 0.0 && s < 1.0))
    val stub = Score.StubBatchModel("onnx-stub", Seq("value"))
      .score(events)
    assert(stub.count() == 200)
    assert(stub.columns.contains("score"))
    val ss = stub.select("score").collect().map(_.getDouble(0))
    assert(ss.forall(s => s > 0.0 && s < 1.0))
  }

  test("evt file parses events, batches and fields") {
    val evt =
      """# comment header
        |StockTick { symbol: "AAPL", price: 150.0, volume: 1000 }
        |// another comment
        |BATCH 100
        |Order { id: 1, symbol: "AAPL" }
        |Order { id: 2, symbol: "GOOG" }
        |BATCH 250
        |Payment { order_id: 1, amount: 15000.0 }
        |Heartbeat { }
        |""".stripMargin
    val dir = Files.createTempDirectory("graft_evt_")
    Files.writeString(dir.resolve("test.evt"), evt)
    val df = EventFile.read(spark, dir.resolve("test.evt").toString)
      .orderBy("line_no")
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("event_type")).toSeq ==
      Seq("StockTick", "Order", "Order", "Payment", "Heartbeat"))
    assert(rows.map(_.getAs[Long]("delay_ms")).toSeq ==
      Seq(0L, 100L, 100L, 250L, 250L))
    val tick = rows.head.getAs[Map[String, String]]("fields")
    assert(tick("symbol") == "AAPL")
    assert(tick("price") == "150.0")
    val hb = rows.last.getAs[Map[String, String]]("fields")
    assert(hb.isEmpty)
  }
}
