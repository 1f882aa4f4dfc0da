package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The SQL catalog surface: CREATE TABLE / INSERT INTO / UPDATE / MERGE
  * INTO / DELETE / time travel / CTAS / INSERT OVERWRITE driven entirely
  * through `spark.sql`, mirroring the reference's spark-sql quickstart
  * (reference spark/sql/quickstart.sql:1-99) against the graft catalog. */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = "/tmp/graft_warehouse_spec"

  private lazy val spark: SparkSession = {
    val d = new java.io.File(wh)
    if (d.exists()) { def rm(f: java.io.File): Unit = { Option(f.listFiles()).foreach(_.foreach(rm)); f.delete() }; rm(d) }
    GraftSession.builder("graft-catalog-test", "4")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", wh)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE + INSERT INTO + filtered SELECT (quickstart.sql:1-43)") {
    sql("""CREATE TABLE graft.trips (
          |  uuid STRING, rider STRING, driver STRING, fare DOUBLE, city STRING
          |) USING graft
          |PARTITIONED BY (city)
          |TBLPROPERTIES (primaryKey = 'uuid', preCombineField = 'fare')""".stripMargin)
    sql("""INSERT INTO graft.trips VALUES
          |  ('t-1','rider-A','driver-K',19.10,'san_francisco'),
          |  ('t-2','rider-B','driver-L',27.70,'san_francisco'),
          |  ('t-3','rider-C','driver-M',33.90,'sao_paulo'),
          |  ('t-4','rider-D','driver-N',93.50,'chennai')""".stripMargin)
    assert(sql("SELECT * FROM graft.trips").count() == 4)
    val high = sql("SELECT uuid, fare FROM graft.trips WHERE fare > 20 ORDER BY uuid")
    assert(high.collect().map(_.getString(0)).toSeq == Seq("t-2", "t-3", "t-4"))
  }

  test("UPDATE by predicate (quickstart.sql:45-47)") {
    sql("UPDATE graft.trips SET fare = fare * 10 WHERE rider = 'rider-D'")
    val fare = sql("SELECT fare FROM graft.trips WHERE uuid = 't-4'").head().getDouble(0)
    assert(math.abs(fare - 935.0) < 1e-9)
    assert(sql("SELECT * FROM graft.trips").count() == 4) // others untouched
  }

  test("MERGE INTO: matched update assignment + not-matched insert (quickstart.sql:59-66)") {
    spark.createDataFrame(Seq(
      ("t-1", "rider-A", "driver-K", -5.0, "san_francisco", 1.0),
      ("t-9", "rider-Z", "driver-Z", 50.0, "sao_paulo", 0.0)))
      .toDF("uuid", "rider", "driver", "fare", "city", "fare_adjustment")
      .createOrReplaceTempView("fare_adjustment")
    sql("""MERGE INTO graft.trips AS target
          |USING fare_adjustment AS source
          |ON target.uuid = source.uuid
          |WHEN MATCHED THEN UPDATE SET target.fare = target.fare + source.fare_adjustment
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(sql("SELECT * FROM graft.trips").count() == 5)
    val t1 = sql("SELECT fare, rider FROM graft.trips WHERE uuid = 't-1'").head()
    assert(math.abs(t1.getDouble(0) - 20.10) < 1e-9) // 19.10 + 1.0; other cols kept
    assert(t1.getString(1) == "rider-A")
    assert(sql("SELECT fare FROM graft.trips WHERE uuid = 't-9'").head().getDouble(0) == 50.0)
  }

  test("MERGE INTO with WHEN MATCHED DELETE: first-match-wins across clauses") {
    sql("""CREATE TABLE graft.md_trips (
          |  uuid STRING, fare DOUBLE, city STRING
          |) USING graft
          |TBLPROPERTIES (primaryKey = 'uuid', preCombineField = 'fare')""".stripMargin)
    sql("""INSERT INTO graft.md_trips VALUES
          |  ('m-1', 10.0, 'sf'), ('m-2', 20.0, 'sp'), ('m-3', 30.0, 'ch')""".stripMargin)
    spark.createDataFrame(Seq(
      ("m-1", 0.0, "sf"),    // matched, refund<=15 → deleted
      ("m-2", 25.0, "sp"),   // matched, fare>15 → updated
      ("m-9", 99.0, "ny")))  // unmatched → inserted
      .toDF("uuid", "fare", "city")
      .createOrReplaceTempView("md_source")
    sql("""MERGE INTO graft.md_trips AS t
          |USING md_source AS s
          |ON t.uuid = s.uuid
          |WHEN MATCHED AND t.fare <= 15 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val rows = sql("SELECT uuid, fare FROM graft.md_trips ORDER BY uuid").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("m-2", "m-3", "m-9"))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(25.0, 30.0, 99.0))
    sql("DROP TABLE graft.md_trips")
  }

  test("DELETE by predicate via SupportsDelete (quickstart.sql:71-74)") {
    sql("DELETE FROM graft.trips WHERE uuid = 't-9'")
    assert(sql("SELECT * FROM graft.trips").count() == 4)
    assert(sql("SELECT * FROM graft.trips WHERE uuid = 't-9'").count() == 0)
  }

  test("time travel VERSION AS OF sees the pre-update snapshot (quickstart.sql:77-81)") {
    val v1 = sql("SELECT fare FROM graft.trips VERSION AS OF '000000001' WHERE uuid = 't-4'")
    assert(math.abs(v1.head().getDouble(0) - 93.50) < 1e-9) // before the UPDATE
    val now = sql("SELECT fare FROM graft.trips WHERE uuid = 't-4'")
    assert(math.abs(now.head().getDouble(0) - 935.0) < 1e-9)
  }

  test("time travel TIMESTAMP AS OF accepts SQL timestamp/date strings (quickstart.sql:77-81)") {
    // a future wall-clock timestamp resolves to the current snapshot
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC).plusDays(1)
    assert(sql(s"SELECT * FROM graft.trips TIMESTAMP AS OF '$tomorrow'").count() == 4)
    val nowTs = java.time.Instant.now().toString.replace("T", " ").takeWhile(_ != 'Z')
    assert(sql(s"SELECT * FROM graft.trips TIMESTAMP AS OF '$nowTs'").count() == 4)
    // a timestamp before the first commit: no snapshot existed — an error,
    // not an empty table
    intercept[Exception](
      sql("SELECT * FROM graft.trips TIMESTAMP AS OF '2000-01-01'").count())
  }

  test("CTAS (quickstart.sql:92-99)") {
    sql("""CREATE TABLE graft.trips_sp USING graft
          |TBLPROPERTIES (primaryKey = 'uuid')
          |AS SELECT uuid, rider, fare FROM graft.trips WHERE city = 'sao_paulo'""".stripMargin)
    assert(sql("SELECT * FROM graft.trips_sp").count() == 1)
    assert(sql("SELECT rider FROM graft.trips_sp").head().getString(0) == "rider-C")
  }

  test("INSERT OVERWRITE replaces content in one commit; history preserved") {
    sql("INSERT OVERWRITE graft.trips_sp VALUES ('t-7','rider-Q',7.0)")
    assert(sql("SELECT uuid FROM graft.trips_sp").head().getString(0) == "t-7")
    // the pre-overwrite snapshot is still readable
    val old = sql("SELECT rider FROM graft.trips_sp VERSION AS OF '000000001'")
    assert(old.head().getString(0) == "rider-C")
  }

  test("SHOW TABLES / DROP TABLE") {
    val names = sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(names.contains("trips") && names.contains("trips_sp"))
    sql("DROP TABLE graft.trips_sp")
    assert(!sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains("trips_sp"))
  }

  test("count(*) and projection-only scans work through the V1 fallback") {
    assert(sql("SELECT count(*) FROM graft.trips").head().getLong(0) == 4L)
    assert(sql("SELECT city FROM graft.trips").distinct().count() == 3)
  }

  test("SQL filters file-prune through the catalog scan without changing results") {
    // partition-path pruning (city is the partition column)
    val sf = sql("SELECT uuid FROM graft.trips WHERE city = 'san_francisco' ORDER BY uuid")
    assert(sf.collect().map(_.getString(0)).toSeq == Seq("t-1", "t-2"))
    // record-key pruning (string key: range + bloom)
    assert(sql("SELECT city FROM graft.trips WHERE uuid = 't-3'")
      .head().getString(0) == "sao_paulo")
    assert(sql("SELECT count(*) FROM graft.trips WHERE uuid IN ('t-1', 't-4')")
      .head().getLong(0) == 2L)
    // pruning metadata engages directly: one partition's files only
    val tbl = graft.tables.GraftTable(spark,
      graft.tables.TableProperties.load(spark, s"$wh/trips").get)
    val all = tbl.timeline.liveFiles(None)
    val pruned = tbl.prunedLiveFiles(Seq(graft.tables.ColBound(
      "city", Some("san_francisco"), Some("san_francisco"), Some(Seq("san_francisco")))))
    assert(pruned.nonEmpty && pruned.size < all.size)
    assert(pruned.forall(_.partition == "city=san_francisco"))
  }

  test("SELECT from a created-but-never-written table is an empty result, not an error") {
    sql("""CREATE TABLE graft.never_written (id BIGINT, v DOUBLE) USING graft
          |TBLPROPERTIES (primaryKey = 'id')""".stripMargin)
    assert(sql("SELECT count(*) FROM graft.never_written").head().getLong(0) == 0L)
    assert(sql("SELECT * FROM graft.never_written WHERE v > 0").count() == 0L)
    sql("DROP TABLE graft.never_written")
  }

  test("ALTER TABLE ADD/DROP COLUMNS: metadata-only schema evolution via SQL") {
    sql("""CREATE TABLE graft.alter_t (id BIGINT, v DOUBLE) USING graft
          |TBLPROPERTIES (primaryKey = 'id', preCombineField = 'id')""".stripMargin)
    sql("INSERT INTO graft.alter_t SELECT id, CAST(id AS DOUBLE) FROM range(0, 5)")
    sql("ALTER TABLE graft.alter_t ADD COLUMNS (note STRING)")
    // existing rows read NULL for the new column, immediately
    val notes = sql("SELECT note FROM graft.alter_t").collect()
    assert(notes.length == 5 && notes.forall(_.isNullAt(0)))
    // and the next write can populate it
    sql("INSERT INTO graft.alter_t VALUES (99, 1.5, 'hello')")
    assert(sql("SELECT note FROM graft.alter_t WHERE id = 99").head().getString(0) == "hello")
    sql("ALTER TABLE graft.alter_t DROP COLUMN v")
    assert(!sql("SELECT * FROM graft.alter_t").columns.contains("v"))
    assert(sql("SELECT * FROM graft.alter_t").count() == 6)
    // renames would need column-id mapping the format doesn't carry: refused
    intercept[Exception](sql("ALTER TABLE graft.alter_t RENAME COLUMN note TO memo"))
    // positioned adds and NOT NULL adds can't hold metadata-only: refused
    // (not silently appended-nullable), same policy as renames
    intercept[Exception](sql("ALTER TABLE graft.alter_t ADD COLUMNS (early STRING FIRST)"))
    intercept[Exception](sql("ALTER TABLE graft.alter_t ADD COLUMNS (req STRING NOT NULL)"))
    assert(!sql("SELECT * FROM graft.alter_t").columns.exists(Set("early", "req")))
    sql("DROP TABLE graft.alter_t")
  }

  test("catalog sync publishes a graft table into the session catalog by name") {
    import graft.tables.{GraftTable, GraftTableConfig}
    import org.apache.spark.sql.functions.{col, lit}
    val p = "/tmp/graft_spec/catalog_sync"
    val tbl = GraftTable(spark, GraftTableConfig(p, "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
    tbl.insert(orders, numFiles = 2)

    assert(graft.sources.CatalogSync.sync(tbl, "gsync", "orders_pub"))
    // SQL clients resolve it by NAME; reads flow through the DataSource
    assert(sql("SELECT count(*) FROM gsync.orders_pub").head().getLong(0) == orders.count())
    assert(sql("SELECT count(*) FROM gsync.orders_pub WHERE o_orderkey = 42")
      .head().getLong(0) == 1L)
    // a second sync with nothing changed is a no-op...
    assert(!graft.sources.CatalogSync.sync(tbl, "gsync", "orders_pub"))
    // ...and upserts are visible WITHOUT re-sync (pointer, not a copy)
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", lit("Y")))
    assert(sql("SELECT count(*) FROM gsync.orders_pub WHERE o_orderstatus = 'Y'")
      .head().getLong(0) == 10L)
    // schema evolution re-publishes on the next sync
    tbl.upsert(tbl.read().limit(5).withColumn("extra_col", lit(7L)))
    assert(graft.sources.CatalogSync.sync(tbl, "gsync", "orders_pub"))
    assert(sql("SELECT max(extra_col) FROM gsync.orders_pub").head().getLong(0) == 7L)
    graft.sources.CatalogSync.unsync(spark, "gsync", "orders_pub")
    assert(tbl.read().count() == orders.count()) // data untouched by unsync
  }

  test("CALL procedures: the Hudi CALL surface through DSv2 stored procedures") {
    sql("""CREATE TABLE graft.proc_t (id BIGINT, v DOUBLE) USING graft
          |TBLPROPERTIES (primaryKey = 'id')""".stripMargin)
    sql("INSERT INTO graft.proc_t SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    sql("INSERT INTO graft.proc_t SELECT id, CAST(id * 2 AS DOUBLE) FROM range(100, 200)")

    // show_commits lists both upsert commits with their file counts
    val commits = sql("CALL graft.system.show_commits('proc_t')").collect()
    assert(commits.length == 2 && commits.forall(_.getInt(2) > 0))
    assert(commits.map(_.getLong(4)).sum == 200L)

    // compact bin-packs; the returned instant is the new head
    val inst = sql("CALL graft.system.compact('proc_t', 1000000)").head().getString(0)
    assert(sql("CALL graft.system.show_commits('proc_t')").collect()
      .last.getString(0) == inst)
    assert(sql("SELECT count(*) FROM graft.proc_t").head().getLong(0) == 200L)

    // savepoint head, corrupt, rollback via CALL: content restored
    sql(s"CALL graft.system.savepoint('proc_t', '$inst')")
    sql("INSERT INTO graft.proc_t SELECT id, -1.0 FROM range(0, 50)")
    val bad = sql("CALL graft.system.show_commits('proc_t')").collect().last.getString(0)
    sql(s"CALL graft.system.rollback('proc_t', '$bad')")
    assert(sql("SELECT count(*) FROM graft.proc_t WHERE v < 0").head().getLong(0) == 0L)

    // clean retains the latest snapshot's files; table still reads right
    val deleted = sql("CALL graft.system.clean('proc_t', 1)").head().getInt(0)
    assert(deleted > 0)
    assert(sql("SELECT count(*) FROM graft.proc_t").head().getLong(0) == 200L)

    // index + validator management through CALL (CREATE INDEX parity)
    sql("CALL graft.system.create_expr_index('proc_t', 'vband', 'floor(v / 100)')")
    assert(sql("CALL graft.system.refresh_expr_index('proc_t', 'vband')")
      .head().getInt(0) == 0) // fresh index already covers every live file
    sql("CALL graft.system.add_validator('proc_t', 'nonneg', " +
      "'SELECT 1 FROM graft_candidate WHERE v < -1000 LIMIT 1')")
    sql("INSERT INTO graft.proc_t SELECT id, 5.0 FROM range(0, 5)") // passes
    intercept[Exception](
      sql("INSERT INTO graft.proc_t SELECT id, -99999.0 FROM range(0, 5)"))
    assert(sql("SELECT count(*) FROM graft.proc_t WHERE v < -1000").head().getLong(0) == 0L)
    sql("CALL graft.system.drop_validator('proc_t', 'nonneg')")
    sql("CALL graft.system.drop_expr_index('proc_t', 'vband')")

    // orphan reaping rides the same surface (nothing to reap here)
    assert(sql("CALL graft.system.clean_orphans('proc_t', 60)").head().getInt(0) == 0)

    // snapshot export: plain parquet, readable raw, row-complete, no meta cols
    val exp = java.nio.file.Files.createTempDirectory("graft_export").toString
    assert(sql(s"CALL graft.system.export_snapshot('proc_t', '$exp')")
      .head().getLong(0) == 200L)
    val raw = spark.read.parquet(exp)
    assert(raw.count() == 200L)
    assert(!raw.columns.exists(_.startsWith("_graft")), raw.columns.mkString(","))

    // procedures are discoverable
    val procs = sql("SHOW PROCEDURES IN graft.system").collect()
      .map(_.toSeq.map(String.valueOf).mkString(","))
    assert(procs.length == 16 && procs.exists(_.contains("compact")))
  }

  test("showCreateTable DDL round-trips a graft table; hiveDdl targets a snapshot export") {
    import graft.sources.CatalogSync
    import graft.tables.{GraftTable, GraftTableConfig}
    import org.apache.spark.sql.functions.col
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/ddl_export", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(GraftSession.table(spark, "/root/testdata/sf0.001", "orders").limit(500),
      numFiles = 2)
    CatalogSync.sync(tbl, "ddl_db", "orders_t")
    val ddl = CatalogSync.showCreateTable(tbl, "ddl_db", "orders_t")
    // the exported text is standalone: drop the live entry, re-create from
    // the DDL alone in a FRESH session state, and read by name
    CatalogSync.unsync(spark, "ddl_db", "orders_t")
    val fresh = spark.newSession()
    fresh.sql(ddl)
    val byName = fresh.table("`ddl_db`.`orders_t`")
    assert(byName.count() == tbl.read().count())
    assert(byName.schema == tbl.read().schema)
    // still a POINTER: a later upsert is visible through the DDL-created entry
    tbl.upsert(tbl.read().limit(1).withColumn("o_orderpriority",
      org.apache.spark.sql.functions.lit("9-DDL")))
    assert(byName.filter(col("o_orderpriority") === "9-DDL").count() == 1)

    // hive-compatible flavor: external parquet DDL over a snapshot export —
    // the LOCATION must read row-complete with a raw parquet reader
    val exp = java.nio.file.Files.createTempDirectory("graft_ddl_export").toString
    tbl.read().write.mode("overwrite").parquet(exp)
    val hive = CatalogSync.hiveDdl(tbl, "ddl_db", "orders_hive", exp)
    assert(hive.startsWith("CREATE EXTERNAL TABLE `ddl_db`.`orders_hive`"))
    assert(hive.contains("STORED AS PARQUET") && hive.contains(s"LOCATION '$exp'"))
    assert(hive.contains("`o_orderkey` BIGINT"))
    assert(spark.read.parquet(exp).count() == tbl.read().count())
    CatalogSync.unsync(spark, "ddl_db", "orders_t")
  }
}
