package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query over the same parquet tables.
  *
  * Determinism contract (see SURVEY.md §4): no double aggregation (cast to
  * DECIMAL(18,2) pre-agg, cast the final aggregate to DOUBLE), identical
  * column aliases on both sides, and a total deterministic ORDER BY.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryRegistry {
  def all: Seq[QueryDef]
}
