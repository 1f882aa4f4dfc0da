package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MOR-dimension aging stress: the COW commits-axis twin
  * ([[TableScaleStress]]) can't see the merge-on-read failure mode —
  * delta files accumulate per upsert and EVERY snapshot read pays the
  * base-vs-delta resolution until compaction folds them. This tool ages
  * a MOR table through `commits` delta-append upserts and, at geometric
  * measure points, times:
  *   - snapshot read (full resolve over all accumulated deltas);
  *   - a point lookup (resolve restricted to the candidate file set);
  *   - then `compact(targetRows)` and the same two reads AFTER — the
  *     cure must return both to their fresh-table cost regardless of how
  *     many deltas had piled up.
  * Flag rule: pre-compaction read time should grow at most linearly in
  * #deltas-since-last-compaction; post-compaction read time must stay
  * FLAT across points. Writes BENCH_SF100_MOR.json.
  *
  * Usage: MorAgingStress [commits] [sfDir] [outJson]
  * (defaults 400, /root/testdata/sf0.01,
  * /root/repo/BENCH_SF100_MOR.json). */
object MorAgingStress {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(400)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val outPath = args.lift(2).getOrElse("/root/repo/BENCH_SF100_MOR.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = "/tmp/graft_mor_stress"
    val cfgT = GraftTableConfig(path, "o_orderkey", "o_orderkey",
      tableType = TableType.Mor)
    val tbl = GraftTable(spark, cfgT)
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").cache()
    val nOrders = orders.count()
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    tbl.insert(orders, numFiles = 64)

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
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val probeKeys = Seq(1L, 7L, 100L, 999L, nOrders / 2)

    val points = Iterator.iterate(25)(_ * 2).takeWhile(_ < commits).toSeq :+ commits
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    var done = 0
    points.foreach { target =>
      while (done < target) { done += 1; tbl.upsert(batch(done)) }
      val nLive = tbl.timeline.liveFiles(None).size
      val (readPreMs, n1) = timeMs(tbl.read().count())
      val (lookupPreMs, _) = timeMs(tbl.pointLookup(probeKeys).count())
      val (compactMs, _) = timeMs(tbl.compact(targetRows = 10000000L))
      val (readPostMs, n2) = timeMs(tbl.read().count())
      val (lookupPostMs, _) = timeMs(tbl.pointLookup(probeKeys).count())
      require(n1 == n2 && n1 == nOrders,
        s"row count drifted: pre=$n1 post=$n2 expected=$nOrders")
      val line =
        s"""{"commits":$done,"live_files_pre":$nLive,""" +
        s""""read_pre_ms":${f1(readPreMs)},"lookup_pre_ms":${f1(lookupPreMs)},""" +
        s""""compact_ms":${f1(compactMs)},"read_post_ms":${f1(readPostMs)},""" +
        s""""lookup_post_ms":${f1(lookupPostMs)}}"""
      println(s"[mor-stress] $line")
      rows += line
    }
    // ---- PHASE 2: the same aging, but compaction is ASYNC — the
    // DeltaStreamer continuous-mode posture the reference demonstrates
    // (compaction.async.enabled=true, trigger NUM_OR_TIME with
    // delta_commits=5). NO manual compact() between points: the background
    // service must keep snapshot reads bounded on its own while upserts
    // keep landing. Flag rule: read/lookup time at EVERY point stays
    // within a small factor of the fresh-table cost (never grows with
    // total commits), and the service's compaction count grows with age.
    val asyncPath = "/tmp/graft_mor_stress_async"
    val aCfg = GraftTableConfig(asyncPath, "o_orderkey", "o_orderkey",
      tableType = TableType.Mor)
    val aTbl = GraftTable(spark, aCfg)
    aTbl.dropIfExists()
    aTbl.insert(orders, numFiles = 64)
    val services = new graft.streaming.AsyncServices(
      aTbl, targetRows = 10000000L, deltaCommits = 5, deltaSeconds = 600L).start()
    val aRows = scala.collection.mutable.ArrayBuffer.empty[String]
    var aDone = 0
    points.foreach { target =>
      while (aDone < target) { aDone += 1; aTbl.upsert(batch(aDone)) }
      val nLive = aTbl.timeline.liveFiles(None).size
      val (readMs, n1) = timeMs(aTbl.read().count())
      val (lookupMs, _) = timeMs(aTbl.pointLookup(probeKeys).count())
      require(n1 == nOrders, s"row count drifted under async compaction: $n1")
      val line =
        s"""{"commits":$aDone,"live_files":$nLive,"read_ms":${f1(readMs)},""" +
        s""""lookup_ms":${f1(lookupMs)},"compactions":${services.compactionsRun}}"""
      println(s"[mor-stress-async] $line")
      aRows += line
    }
    services.close()
    // the service must have carried the compaction load (one per ~5 delta
    // commits modulo in-flight timing), or phase 2 silently measured the
    // same unbounded growth as phase 1's pre-compaction numbers
    require(services.compactionsRun >= points.size,
      s"async compactor barely ran: ${services.compactionsRun} compactions over $aDone commits")
    val (readFinalMs, _) = timeMs(aTbl.read().count())
    aTbl.dropIfExists()

    val summary = s"""{"commits":$done,"sf":"$sfDir","points":[${rows.mkString(",")}],""" +
      s""""async_trigger":"NUM_OR_TIME delta_commits=5","async_points":[${aRows.mkString(",")}],""" +
      s""""async_read_final_ms":${f1(readFinalMs)}}"""
    println(s"[mor-stress-summary] $summary")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), summary + "\n")
    catch { case _: Exception => () }
    tbl.dropIfExists()
    spark.stop()
  }
}
