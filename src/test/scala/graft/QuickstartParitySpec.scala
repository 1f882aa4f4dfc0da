package graft

import graft.tables.{FieldPartition, GraftTable, GraftTableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Step-for-step behavioral parity with the reference's SQL test script
  * (spark/sql/quickstart.sql): create a partitioned keyed table, insert 8
  * trip rows, filtered query, UPDATE one rider's fare, MERGE a fare
  * adjustment (2 updates + 2 inserts -> count 10), DELETE one record,
  * time-travel back, and read the change stream. Same checkpoints, graft
  * APIs. */
class QuickstartParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def trips = {
    import spark.implicits._
    Seq(
      (1695159649087L, "t-001", "rider-A", "driver-K", 19.10, "san_francisco"),
      (1695091554788L, "t-002", "rider-C", "driver-M", 27.70, "san_francisco"),
      (1695046462179L, "t-003", "rider-D", "driver-L", 33.90, "san_francisco"),
      (1695332066204L, "t-004", "rider-E", "driver-O", 93.50, "san_francisco"),
      (1695516137016L, "t-005", "rider-F", "driver-P", 34.15, "sao_paulo"),
      (1695376420876L, "t-006", "rider-G", "driver-Q", 43.40, "sao_paulo"),
      (1695173887231L, "t-007", "rider-I", "driver-S", 41.06, "chennai"),
      (1695115999911L, "t-008", "rider-J", "driver-T", 17.85, "chennai"))
      .toDF("ts", "uuid", "rider", "driver", "fare", "city")
  }

  test("the full quickstart flow: insert, query, update, merge, delete, time travel, changes") {
    import spark.implicits._
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/quickstart", "uuid", "ts",
      keyGen = FieldPartition("city"), writeChangelog = true))
    tbl.dropIfExists()

    // INSERT 8 rows (quickstart.sql:27-38) — count must be 8
    val i1 = tbl.insert(trips)
    assert(tbl.read().count() == 8)

    // filtered query (quickstart.sql:43): fare > 20 must return 6 rows
    assert(tbl.read().filter($"fare" > 20.0).count() == 6)

    // UPDATE (quickstart.sql:45-47): set fare=25 where rider-D, then check
    tbl.upsert(tbl.read().filter($"rider" === "rider-D").withColumn("fare", lit(25.0)))
    assert(tbl.read().filter($"rider" === "rider-D").select("fare").head().getDouble(0) == 25.0)

    // MERGE a fare adjustment (quickstart.sql:50-66): 2 matched updates +
    // 2 new riders -> count 10
    val adjustment = Seq(
      (1695091554788L, "t-002", "rider-C", "driver-M", 25.00, "san_francisco"),
      (1695530237068L, "t-009", "rider-K", "driver-U", 64.20, "san_francisco"),
      (1695241330902L, "t-010", "rider-H", "driver-R", 66.60, "sao_paulo"),
      (1695115999911L, "t-008", "rider-J", "driver-T", 19.70, "chennai"))
      .toDF("ts", "uuid", "rider", "driver", "fare", "city")
    tbl.merge(adjustment)
    assert(tbl.read().count() == 10)
    assert(tbl.read().filter($"uuid" === "t-002").select("fare").head().getDouble(0) == 25.00)

    // DELETE one record (quickstart.sql:71-74) -> its count becomes 0
    tbl.delete($"uuid" === "t-009")
    assert(tbl.read().filter($"uuid" === "t-009").count() == 0)
    assert(tbl.read().count() == 9)

    // time travel (quickstart.sql:77-81): the first commit still shows 8 rows
    assert(tbl.readAsOf(i1).count() == 8)
    assert(tbl.readAsOfTimestamp(System.currentTimeMillis()).count() == 9)

    // incremental changes since the first commit (quickstart.sql:83-90,
    // latest_state): every key touched after i1, at its latest live state
    val inc = tbl.incremental(i1, tbl.timeline.latestInstant().get)
    assert(inc.select("uuid").as[String].collect().sorted.toSeq ==
      Seq("t-002", "t-003", "t-008", "t-010"))

    // CDC stream shows the full change history with images
    val changes = tbl.cdc(i1, tbl.timeline.latestInstant().get)
    val byType = changes.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == 2) // t-009, t-010
    assert(byType("delete") == 1) // t-009
    assert(byType("update_preimage") == byType("update_postimage"))
  }
}
