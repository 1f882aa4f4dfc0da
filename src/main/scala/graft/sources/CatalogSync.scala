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

  /** Backtick-quote one identifier part (doubling embedded backticks) —
    * used for EVERY name this object emits, SQL text and catalog API
    * alike, so a name that needs quoting behaves identically on both
    * paths instead of failing only on one. */
  private def q(part: String): String = "`" + part.replace("`", "``") + "`"

  /** Whether the published entry already points at `path`. A Spark-native
    * catalog round-trips the DataSource option as storage.properties
    * ("path"); a real Hive metastore may instead surface only the table
    * location URI — accept either, comparing scheme-stripped paths, so
    * sync stays a no-op when current rather than degrading to a perpetual
    * drop+recreate (which opens a reader-visible gap every run). */
  private def pointsAt(storage: org.apache.spark.sql.catalyst.catalog.CatalogStorageFormat,
      path: String): Boolean = {
    def norm(p: String): String = new org.apache.hadoop.fs.Path(p).toUri.getPath
    storage.properties.get("path").map(norm).contains(norm(path)) ||
      storage.locationUri.map(u => norm(u.toString)).contains(norm(path))
  }

  /** Create or refresh `database.tableName` → the graft table at
    * `table.cfg.path`. Returns true if the entry was (re)created, false if
    * it was already current. */
  def sync(table: GraftTable, database: String, tableName: String): Boolean = {
    val spark = table.spark
    val schema = table.read().schema
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${q(database)}")
    val full = s"${q(database)}.${q(tableName)}"
    val current =
      try {
        val t = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName, Some(database)))
        t.provider.contains("graft") &&
          pointsAt(t.storage, table.cfg.path) &&
          t.schema == schema
      } catch { case _: org.apache.spark.sql.catalyst.analysis.NoSuchTableException => false }
    if (current) return false
    spark.sql(s"DROP TABLE IF EXISTS $full")
    spark.catalog.createTable(full, "graft", schema,
      Map("path" -> table.cfg.path))
    true
  }

  /** Drop the catalog pointer (the table's data is untouched). */
  def unsync(spark: org.apache.spark.sql.SparkSession,
      database: String, tableName: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS ${q(database)}.${q(tableName)}")

  private def columnsDdl(table: GraftTable): String =
    table.read().schema.fields
      .map(f => s"  ${q(f.name)} ${f.dataType.sql}")
      .mkString(",\n")

  private def quoteSqlString(s: String): String = s.replace("'", "''")

  /** `SHOW CREATE TABLE`-style DDL export: the exact statement that
    * re-registers this table in ANY catalog a Spark deployment points at
    * (in-memory, Derby, a real Hive metastore, Glue) — the portable
    * metastore sync-out the reference gets from `hive_sync` /
    * glue Code.py:41-42. Unlike [[sync]], which writes into the LIVE
    * session catalog, the DDL is a plain string a different cluster or a
    * later session can run; CatalogSpec round-trips a table through it. */
  def showCreateTable(table: GraftTable, database: String, tableName: String): String =
    s"""CREATE TABLE ${q(database)}.${q(tableName)} (
       |${columnsDdl(table)})
       |USING graft
       |OPTIONS (path '${quoteSqlString(table.cfg.path)}')""".stripMargin

  /** Hive-compatible EXTERNAL TABLE DDL for readers WITHOUT the graft jar
    * (Presto/Trino/Hive/Athena), pointed at a plain-parquet snapshot
    * export (see `CALL export_snapshot` / t_snapshot_export). It must NOT
    * point at the live table root: the root holds every commit's file
    * groups, so a raw parquet reader there would double-count replaced
    * rows — exactly why Hudi's hive-sync registers its own input format.
    * Executing it needs a Hive-enabled catalog; this emits the text. */
  def hiveDdl(table: GraftTable, database: String, tableName: String,
      snapshotLocation: String): String =
    s"""CREATE EXTERNAL TABLE ${q(database)}.${q(tableName)} (
       |${columnsDdl(table)})
       |STORED AS PARQUET
       |LOCATION '${quoteSqlString(snapshotLocation)}'""".stripMargin
}
