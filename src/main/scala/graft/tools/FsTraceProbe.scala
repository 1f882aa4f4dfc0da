package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession

/** Diagnostic: run ONE indexed-table upsert under the metered filesystem
  * with `GRAFT_FS_TRACE=<class>` and print the top call stacks for that
  * class — names which code path pays each object-store call class
  * (feeds the commit-bill cuts S3CostModel then verifies).
  *
  * Usage: GRAFT_FS_TRACE=status FsTraceProbe [sfDir] [files] */
object FsTraceProbe {
  def main(args: Array[String]): Unit = {
    graft.sources.FsCalls.enablePhases()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nf = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.CountingLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").cache()
    orders.count()
    val p = s"/tmp/graft_fstrace_$nf"
    val t = GraftTable(spark, GraftTableConfig(p, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 16,
      secondaryIndexCols = Seq("o_orderpriority", "o_custkey")))
    t.dropIfExists()
    t.insert(orders, numFiles = nf)
    val before = graft.sources.FsCalls.snapshot()
    graft.sources.FsCalls.traceReset()
    t.upsert(orders.limit(200))
    val d = graft.sources.FsCalls.delta(before)
    println("=== per-phase deltas ===")
    d.toSeq.sortBy(_._1).foreach { case (k, n) => println(f"$n%8d  $k") }
    println("=== top stacks for GRAFT_FS_TRACE class ===")
    graft.sources.FsCalls.traceTop(25).foreach { case (st, n) =>
      println(f"\n$n%8d  $st")
    }
    t.dropIfExists()
    spark.stop()
  }
}
