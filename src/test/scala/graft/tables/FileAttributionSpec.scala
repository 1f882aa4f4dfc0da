package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** File-attribution under Spark cache substitution.
  *
  * Write-path hit detection must know WHICH file each matched row came
  * from. `input_file_name()` silently returns "" when the CacheManager
  * substitutes a concurrently `.cache()`d identical scan (canonical-plan
  * match) into the query — and upserts cache exactly such scans
  * (`affected`), so one writer's cache can poison another's hit
  * detection in the same JVM: matched keys attribute to no file, the
  * upsert "discovers" no hits, and existing keys are re-INSERTED
  * (duplicate rows; for delete, a silent no-op). Found by
  * ConcurrencyStress as a 149-row duplication under 2 OCC writers.
  * The fix reads the `_metadata.file_path` column instead, which is part
  * of the scan's required output — a plan that needs it can never be
  * served by a cache entry that lacks it. */
class FileAttributionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.GraftSession
    .builder("graft-fileattr-test", "4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def orders = graft.GraftSession.table(spark, "/root/testdata/sf0.001", "orders")

  test("upsert/delete hit detection survives a concurrently cached identical scan") {
    val dir = "/tmp/graft_spec/cache_substitution"
    val tbl = GraftTable(spark, GraftTableConfig(dir, "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    val n = orders.count()

    // simulate the concurrent writer: cache an IDENTICAL scan of the same
    // live files (upserts do exactly this internally via affected.cache())
    def poison(): org.apache.spark.sql.DataFrame = {
      val c = tbl.readFiles(tbl.timeline.liveFiles(None)).cache()
      c.count() // materialize so substitution actually kicks in
      c
    }

    val c1 = poison()
    try {
      tbl.upsert(orders.filter(col("o_orderkey") === 42L)
        .withColumn("o_orderstatus", lit("Z")))
      assert(tbl.read().count() == n,
        "upsert re-inserted existing keys under cache substitution")
      val r = tbl.read().filter(col("o_orderkey") === 42L).collect()
      assert(r.length == 1 && r(0).getAs[String]("o_orderstatus") == "Z")
    } finally c1.unpersist()

    val c2 = poison()
    try {
      tbl.delete(col("o_orderkey") === 42L)
      assert(tbl.read().filter(col("o_orderkey") === 42L).count() == 0,
        "delete no-opped under cache substitution")
      assert(tbl.read().count() == n - 1)
    } finally c2.unpersist()
    tbl.dropIfExists()
  }
}
