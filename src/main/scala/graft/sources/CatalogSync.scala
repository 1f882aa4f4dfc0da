package graft.sources

import graft.tables.GraftTable

/** External-catalog sync — the analogue of the reference's Hive/Glue sync
  * (DeltaStreamerExample.scala:21-35 `hoodie.datasource.hive_sync.*`, glue
  * Code.py:29 registering tables under `spark_catalog`): publish a graft
  * table into the SESSION catalog (Spark's metastore surface — in-memory,
  * Derby, or a real Hive metastore, whatever the deployment configures) so
  * any SQL client resolves it by `db.table` name.
  *
  * The catalog entry is a POINTER (format "graft" + path), never a data
  * copy: reads by name go through the DataSource, so snapshot resolution,
  * MOR merge, file pruning and pushdown all still apply. Partitions are not
  * enumerated into the catalog (the Hudi partition-extractor machinery) —
  * graft prunes from its own timeline metadata, which is the point of
  * keeping table state in the table. Re-running sync after schema evolution
  * refreshes the published schema; sync is idempotent. */
object CatalogSync {

  /** Create or refresh `database.tableName` → the graft table at
    * `table.cfg.path`. Returns true if the entry was (re)created, false if
    * it was already current. */
  def sync(table: GraftTable, database: String, tableName: String): Boolean = {
    val spark = table.spark
    val schema = table.read().schema
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$database`")
    val full = s"`$database`.`$tableName`"
    val current =
      try {
        val t = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName, Some(database)))
        t.provider.contains("graft") &&
          t.storage.properties.get("path").contains(table.cfg.path) &&
          t.schema == schema
      } catch { case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => false }
    if (current) return false
    spark.sql(s"DROP TABLE IF EXISTS $full")
    spark.catalog.createTable(s"$database.$tableName", "graft", schema,
      Map("path" -> table.cfg.path))
    true
  }

  /** Drop the catalog pointer (the table's data is untouched). */
  def unsync(spark: org.apache.spark.sql.SparkSession,
      database: String, tableName: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$database`.`$tableName`")
}
