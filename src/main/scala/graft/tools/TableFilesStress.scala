package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** FILES-dimension scale stress for the lakehouse table core — the
  * companion of [[TableScaleStress]] (the commits dimension; rewrite
  * consolidation self-heals file counts there, so the files axis needs
  * its own sweep). For each file count, builds a fresh indexed table at
  * that granularity and times every metadata operation whose cost rides
  * #files:
  *   - insert (includes the per-file footer key-stats harvest and the
  *     record/secondary index writes);
  *   - cold snapshot resolution (fresh handle → liveFiles: commit JSON
  *     parse is O(#files));
  *   - RLI point lookup / secondary-index equality lookup;
  *   - expression-index create (one scan job, bucket-sharded by file)
  *     and a pruned range read through it.
  * Emits one JSON line per file count and writes the run to
  * BENCH_SF100_FILES.json. Flag rule: each metric's growth between
  * consecutive points should not exceed the file-count ratio
  * (super-linear in #files = a driver loop or metadata blowup).
  *
  * Usage: TableFilesStress [sfDir] [counts,csv] [outJson]
  * (defaults /root/testdata/sf0.1, 256,1024,4096,10000). */
object TableFilesStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = args.lift(1).getOrElse("256,1024,4096,10000")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = args.lift(2).getOrElse("/root/repo/BENCH_SF100_FILES.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // count FS calls alongside wall time: on an object store the call
      // count IS the metadata bill, and call-count flatness across the
      // file axis is the glue-benchmark chart wall-clock can't draw
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.CountingLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").cache()
    val nOrders = orders.count()
    def timeMs[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e6, r)
    }
    // wall ms + total FS calls for one op — the files-axis lookups must
    // be flat in BOTH dimensions (flat wall on a local SSD can hide a
    // LIST storm an object store would bill for)
    def timedCalls[T](body: => T): (Double, Long, T) = {
      val before = graft.sources.FsCalls.snapshot()
      val (ms, r) = timeMs(body)
      (ms, graft.sources.FsCalls.delta(before).values.sum, r)
    }
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val probeKeys = Seq(1L, 7L, 100L, 999L, nOrders / 2)

    val rows = counts.map { nf =>
      val path = s"/tmp/graft_files_stress_$nf"
      val cfgT = GraftTableConfig(path, "o_orderkey", "o_orderkey",
        recordIndexBuckets = 16,
        secondaryIndexCols = Seq("o_orderpriority", "o_custkey"))
      val tbl = GraftTable(spark, cfgT)
      tbl.dropIfExists()
      val (insertMs, _) = timeMs(tbl.insert(orders, numFiles = nf))
      val (coldMs, nFiles) = {
        val t = GraftTable(spark, cfgT)
        val (ms, fs) = timeMs(t.timeline.liveFiles(None))
        (ms, fs.size)
      }
      val (rliMs, rliCalls, _) = timedCalls(tbl.pointLookup(probeKeys).count())
      val (siMs, _) =
        timeMs(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count())
      // SELECTIVE equality through the VALUE-BUCKETED merged index: a
      // second commit enables the fold, the fold hash-partitions by value
      // (buckets forced >1 so the bucketed read path is what's measured),
      // and the probe custkey matches ~10 orders regardless of nf — this
      // is the metric verdict r10 #3 demands stay FLAT in #files
      tbl.upsert(orders.limit(100))
      val (siCompactMs, _) =
        timeMs(tbl.compactSecondaryIndex("o_custkey", buckets = 16))
      val (siSelMs, siSelCalls, nSel) =
        timedCalls(tbl.readBySecondary("o_custkey", Seq(0L)).count())
      val (exprCreateMs, _) =
        timeMs(tbl.createExpressionIndex("om", "month(o_orderdate)"))
      val (exprReadMs, _) = timeMs {
        val files = tbl.exprIndexFiles("om", 3, 3)
        files.size
      }
      // COMMIT STAT-HARVEST tiers on identical inputs: the data files of
      // this table's bulk-load commit, harvested (a) on the bounded
      // driver pool — the sub-threshold tier — and (b) as a Spark job —
      // the above-threshold tier a 1e5-file bulk load takes, where the
      // driver's own share is a collect of #files small rows. Stats must
      // be identical; the job tier is what keeps DRIVER wall time from
      // owning the commit at 100 TB file counts.
      val dataFiles = {
        val fsys = new org.apache.hadoop.fs.Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val it = fsys.listFiles(new org.apache.hadoop.fs.Path(s"$path/data"), true)
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(org.apache.hadoop.fs.Path, Long)]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(".parquet"))
            buf += ((f.getPath, f.getLen))
        }
        buf.toSeq
      }
      val rootStr = {
        val rp = new org.apache.hadoop.fs.Path(path)
        rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .makeQualified(rp).toUri.getPath
      }
      def harvest(driverMax: Int) = GraftTable.harvestFileMetas(spark,
        dataFiles, "o_orderkey", Set.empty, rootStr, 0, driverMax)
      val (harvDrvMs, metaDrv) = timeMs(harvest(Int.MaxValue))
      val (harvJobMs, metaJob) = timeMs(harvest(-1))
      require(metaDrv.sortBy(_.path) == metaJob.sortBy(_.path),
        s"harvest tiers disagree at $nf files")
      val line =
        s"""{"num_files":$nFiles,"rows":$nOrders,"insert_ms":${f1(insertMs)},""" +
        s""""cold_livefiles_ms":${f1(coldMs)},"rli_lookup_ms":${f1(rliMs)},""" +
        s""""rli_lookup_fs_calls":$rliCalls,""" +
        s""""si_lookup_ms":${f1(siMs)},"si_compact_ms":${f1(siCompactMs)},""" +
        s""""si_selective_ms":${f1(siSelMs)},"si_selective_rows":$nSel,""" +
        s""""si_selective_fs_calls":$siSelCalls,""" +
        s""""expr_create_ms":${f1(exprCreateMs)},""" +
        s""""expr_prune_ms":${f1(exprReadMs)},""" +
        s""""harvest_driver_ms":${f1(harvDrvMs)},""" +
        s""""harvest_job_ms":${f1(harvJobMs)},"harvest_files":${dataFiles.size}}"""
      println(s"[files-stress] $line")
      tbl.dropIfExists()
      line
    }
    val summary = s"""{"sf":"$sfDir","points":[${rows.mkString(",")}]}"""
    println(s"[files-stress-summary] $summary")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), summary + "\n")
    catch { case _: Exception => () }
    spark.stop()
  }
}
