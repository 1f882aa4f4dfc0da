package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for the table-op write path (dev tool, not part of
  * the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val orders = GraftSession.table(spark, sfDir, "orders")
    time("warmup count")(orders.count())

    if (args.headOption.contains("rli")) {
      // phase profile of t_rli_compact (the battery's heaviest op)
      val tbl = GraftTable(spark, GraftTableConfig(
        "/tmp/graft_prof/t_rli", "o_orderkey", "o_orderkey",
        recordIndexBuckets = 16))
      tbl.dropIfExists()
      time("rli insert 4 files")(tbl.insert(orders, numFiles = 4))
      (1 to 2).foreach { i =>
        time(s"rli upsert wave $i")(
          tbl.upsert(orders.filter(col("o_orderkey") % 9 === i)
            .withColumn("o_orderstatus", lit(s"W$i"))))
      }
      time("rli compactRecordIndex")(tbl.compactRecordIndex())
      time("rli pointLookup")(
        tbl.pointLookup(Seq(1L, 7L, 11L, 12L, 100L, 999L)).orderBy("o_orderkey").count())
      spark.stop()
      return
    }

    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_prof/t_upsert", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()

    time("insert 4 files")(tbl.insert(orders, numFiles = 4))
    val batch = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100)
      .withColumn("o_orderstatus", lit("U"))
    time("upsert 10% batch")(tbl.upsert(batch))
    time("read+count")(tbl.read().count())
    time("read+orderBy+count")(tbl.read().orderBy("o_orderkey").count())

    // second run, warm
    val tbl2 = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_prof/t_upsert2", "o_orderkey", "o_orderkey"))
    tbl2.dropIfExists()
    time("insert 4 files (warm)")(tbl2.insert(orders, numFiles = 4))
    time("upsert 10% (warm)")(tbl2.upsert(batch))

    // raw parquet write, bloom on vs off
    val flat = orders.repartition(4)
    time("raw write with bloom")(
      flat.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .parquet("/tmp/graft_prof/raw_bloom"))
    time("raw write no bloom")(
      flat.write.mode("overwrite").parquet("/tmp/graft_prof/raw_nobloom"))
    time("raw write bloom ndv")(
      flat.write.mode("overwrite")
        .option(s"parquet.bloom.filter.enabled#o_orderkey", "true")
        .option(s"parquet.bloom.filter.expected.ndv#o_orderkey", "100000")
        .parquet("/tmp/graft_prof/raw_bloom_ndv"))
    println("[profile] bloom file sizes: " +
      Seq("raw_bloom", "raw_nobloom", "raw_bloom_ndv").map { d =>
        val dir = new java.io.File(s"/tmp/graft_prof/$d")
        d + "=" + dir.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      }.mkString(", "))

    spark.stop()
  }
}
