package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Score

/** Model-scoring surface (reference `.score()`, scoring.rs). */
object MlQueries {

  val defs: Map[String, QueryDef] = Map(

    // --- .score(): linear model over event fields, rational sigmoid ---
    "m2_score" -> QueryDef.of(
      """SELECT event_id,
        | 0.5 + 0.5 * (-0.8::DOUBLE + value * 0.01::DOUBLE) /
        |   (1.0::DOUBLE + abs(-0.8::DOUBLE + value * 0.01::DOUBLE)) AS score
        |FROM events""".stripMargin) {
      (s, dir) =>
        Score.LinearModel("risk", Map("value" -> 0.01), bias = -0.8)
          .score(Tables(s, dir).events)
          .select("event_id", "score")
    })
}
