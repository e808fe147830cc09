package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark plan plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables.
  *
  * Oracle parity rules (the driver hash-compares values):
  *  - every computed column aliased identically on both sides;
  *  - money/quantity sums go through DECIMAL so they are exact and
  *    order-independent, then CAST to DOUBLE;
  *  - order-sensitive folds (EMA, dot products) are written as
  *    explicit in-order left folds on BOTH sides → bit-identical;
  *  - int counts CAST to BIGINT in DuckDB (its SUM(int) is HUGEINT);
  *  - event order = `event_id` (unique, consistent with `ts`);
  *  - durations compared in µs via unix_micros / epoch_us.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, Some(oracle))
  def rowsOnly(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(build, None)
}
