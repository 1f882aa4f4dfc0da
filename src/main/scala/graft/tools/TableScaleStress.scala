package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commits/files-dimension scale stress for the lakehouse table core —
  * the 100× analogue of the documents/embeddings artifacts, for the one
  * family whose 100 TB posture otherwise rests on design argument.
  *
  * Ages ONE table (record index + secondary index + expression index)
  * through `commits` upsert commits, and at geometric measure points
  * times the metadata operations whose cost SURVEY §3/§5 claims are
  * O(recent commits), not O(table age):
  *   - cold snapshot resolution (fresh Timeline handle → liveFiles):
  *     replays commit JSONs since the last checkpoint;
  *   - RLI point lookup, pre-compaction (reads O(#uncompacted dirs));
  *   - incremental compactRecordIndex + the post-compaction lookup;
  *   - secondary-index lookup pre/post incremental compactSecondaryIndex;
  *   - incremental refreshExpressionIndex (O(new files));
  *   - at the END: checkpointTimeline, then cold liveFiles again — the
  *     post-checkpoint resolution must be flat in total age.
  *
  * Emits one JSON line per measure point (and a final summary line) and
  * writes the whole run to BENCH_SF100_TABLE.json. Flag rule, stated in
  * the artifact: a per-point metric is SUPER-LINEAR-suspect when its
  * time ratio between consecutive points exceeds the commit ratio; the
  * maintained ops (post-compaction lookup, cold-after-checkpoint) must
  * stay FLAT.
  *
  * Usage: TableScaleStress [commits] [sfDir] [numFiles] [outJson]
  * (defaults 1000, /root/testdata/sf0.01, 256,
  * /root/repo/BENCH_SF100_TABLE.json). */
object TableScaleStress {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(1000)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val numFiles = args.lift(2).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = "/tmp/graft_table_stress"
    val cfgT = GraftTableConfig(path, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 16,
      secondaryIndexCols = Seq("o_orderpriority"))
    val tbl = GraftTable(spark, cfgT)
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").cache()
    val nOrders = orders.count()
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    tbl.insert(orders, numFiles = numFiles)
    // key-range clustering: un-clustered insert round-robins keys across
    // files, so ANY batch would touch ~every file group; after clustering
    // a contiguous key-range batch rewrites the realistic handful
    tbl.cluster(Seq("o_orderkey"), numFiles = numFiles)
    tbl.createExpressionIndex("om", "month(o_orderdate)")

    // small upsert batches over CONTIGUOUS key ranges, cycling through
    // the key space: file groups are key-range-clustered, so each commit
    // rewrites a realistic HANDFUL of file groups (a mod-slice batch
    // would touch every group and turn each commit into a table rewrite)
    val ranges = 100
    val width = maxKey / ranges + 1
    def batch(i: Int) = {
      val lo = (i % ranges).toLong * width
      orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < lo + width)
        .withColumn("o_orderstatus", lit(s"S$i"))
    }

    def timeMs[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = body
      ((System.nanoTime() - t0) / 1e6, r)
    }
    // a FRESH handle defeats the Timeline's commit/checkpoint caches —
    // this is the cold cost a new executor/driver pays
    def coldLiveFilesMs(): (Double, Int) = {
      val t = GraftTable(spark, cfgT)
      val (ms, fs) = timeMs(t.timeline.liveFiles(None))
      (ms, fs.size)
    }
    val probeKeys = Seq(1L, 7L, 100L, 999L, nOrders / 2)

    val points = Iterator.iterate(25)(_ * 2).takeWhile(_ < commits).toSeq :+ commits
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = 0
    points.foreach { target =>
      while (done < target) { done += 1; tbl.upsert(batch(done)) }
      val (coldMs, nFiles) = coldLiveFilesMs()
      val (rliPreMs, _) = timeMs(tbl.pointLookup(probeKeys).count())
      val (rliCompactMs, rliFolded) = timeMs(tbl.compactRecordIndex())
      val (rliPostMs, _) = timeMs(tbl.pointLookup(probeKeys).count())
      val (siPreMs, _) =
        timeMs(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count())
      val (siCompactMs, siFolded) =
        timeMs(tbl.compactSecondaryIndex("o_orderpriority"))
      val (siPostMs, _) =
        timeMs(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count())
      val (exprRefreshMs, nIndexed) = timeMs(tbl.refreshExpressionIndex("om"))
      // the dead-weight bound, measured: merged RLI rows vs live data
      // rows at every age — the incremental fold's auto-escalation must
      // keep merged_rows within ~2x live_rows under churn (the range-
      // churn workload kills ~1/ranges of the base's mappings per
      // commit, so without the bound this ratio would grow without
      // limit over the table's life)
      val liveRows = tbl.timeline.liveFiles(None).map(_.rows).sum
      val mergedRows = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$path/_graft/rli").count()
      def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
      val line =
        s"""{"commits":$done,"live_files":$nFiles,"cold_livefiles_ms":${f1(coldMs)},""" +
        s""""rli_lookup_pre_ms":${f1(rliPreMs)},"rli_compact_ms":${f1(rliCompactMs)},""" +
        s""""rli_dirs_folded":$rliFolded,"rli_lookup_post_ms":${f1(rliPostMs)},""" +
        s""""rli_index_rows":$mergedRows,"live_rows":$liveRows,""" +
        s""""si_lookup_pre_ms":${f1(siPreMs)},"si_compact_ms":${f1(siCompactMs)},""" +
        s""""si_dirs_folded":$siFolded,"si_lookup_post_ms":${f1(siPostMs)},""" +
        s""""expr_refresh_ms":${f1(exprRefreshMs)},"expr_files_indexed":$nIndexed}"""
      println(s"[stress] $line")
      rows += line
    }
    // the checkpoint cure: resolution cost must drop to O(1 checkpoint
    // read + 0 commits) no matter how many commits the table has lived
    val (preCpColdMs, _) = coldLiveFilesMs()
    val (cpMs, _) = timeMs(tbl.checkpointTimeline())
    val (postCpColdMs, nFinal) = coldLiveFilesMs()
    val (finalLookupMs, _) = timeMs(tbl.pointLookup(probeKeys).count())
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val summary =
      s"""{"commits":$done,"live_files":$nFinal,""" +
      s""""cold_livefiles_pre_checkpoint_ms":${f1(preCpColdMs)},""" +
      s""""checkpoint_ms":${f1(cpMs)},""" +
      s""""cold_livefiles_post_checkpoint_ms":${f1(postCpColdMs)},""" +
      s""""rli_lookup_final_ms":${f1(finalLookupMs)},""" +
      s""""points":[${rows.mkString(",")}]}"""
    println(s"[stress-summary] $summary")
    val outPath = args.lift(3).getOrElse("/root/repo/BENCH_SF100_TABLE.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), summary + "\n")
    catch { case _: Exception => () }
    tbl.dropIfExists()
    spark.stop()
  }
}
