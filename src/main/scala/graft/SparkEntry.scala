package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 for the operator inventory. */
object SparkEntry {

  /** All registered operator families. Each registry contributes QueryDefs
    * (Spark impl + optional DuckDB oracle). */
  def registries: Seq[QueryRegistry] = Seq(
    graft.operators.Queries,
    graft.tables.TableOps,
    graft.dedup.Dedup,
    graft.ann.Ann,
    graft.text.TextOps,
    graft.multimodal.Multimodal,
    graft.streaming.StreamingOps,
    graft.pipeline.Curation)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.all).map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.all).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
