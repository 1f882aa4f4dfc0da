package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PARTITION-CARDINALITY scale stress — the third metadata axis after
  * commits ([[TableScaleStress]]) and files ([[TableFilesStress]]). A
  * 100 TB table is routinely hive-partitioned by day x tenant into
  * thousands of partitions, and the operations that must NOT scale with
  * TOTAL partition count are exactly the ones a per-partition consumer
  * runs: read ONE partition, drop ONE partition, overwrite ONE
  * partition. For each partition count this builds a field-partitioned
  * table (uniform rows per partition) and measures, in wall ms AND
  * metered FS calls (the object-store bill — see [[S3CostModel]]):
  *   - partitioned insert (writes one file per partition by design —
  *     cost is O(#partitions), the baseline the reads must NOT follow);
  *   - cold snapshot resolution (one commit JSON, independent of
  *     partition fan-out);
  *   - partition-pruned read (readWhere on one partition: touched files
  *     = that partition's files ONLY — the flat-in-total-count claim);
  *   - dropPartitions of one partition (metadata-only commit: no data
  *     file is read or moved);
  *   - insertOverwritePartitions of one partition (rewrites one
  *     partition's rows, removes only that partition's files).
  * Emits one JSON line per count → BENCH_SF100_PARTS.json. Flag rule:
  * pruned read / drop / overwrite-one FS calls should stay ~flat while
  * partition count grows 20x; insert is the only O(#partitions) row.
  *
  * Usage: PartitionScaleStress [sfDir] [counts,csv] [outJson]
  * (defaults /root/testdata/sf0.1, 256,1024,5000). */
object PartitionScaleStress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val counts = args.lift(1).getOrElse("256,1024,5000")
      .split(",").map(_.trim.toInt).toSeq
    val outPath = args.lift(2).getOrElse("/root/repo/BENCH_SF100_PARTS.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
    def f1(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    def shape[T](body: => T): (Double, Long, T) = {
      val before = graft.sources.FsCalls.snapshot()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e6,
        graft.sources.FsCalls.delta(before).values.sum, r)
    }

    val rows = counts.map { np =>
      val path = s"/tmp/graft_parts_stress_$np"
      val cfgT = GraftTableConfig(path, "o_orderkey", "o_orderkey",
        keyGen = FieldPartition("part"))
      val tbl = GraftTable(spark, cfgT)
      tbl.dropIfExists()
      val batch = orders.withColumn("part",
        (col("o_orderkey") % np).cast("string"))
      val (insMs, insCalls, _) = shape(tbl.insert(batch, numFiles = np))
      val (coldMs, coldCalls, nFiles) = shape {
        GraftTable(spark, cfgT).timeline.liveFiles(None).size
      }
      val target = "part=7"
      val expect = tbl.timeline.liveFiles(None).count(_.partition == target)
      val (readMs, readCalls, readRows) = shape {
        GraftTable(spark, cfgT).readWhere(_ == target)
          .filter(col("part") === "7").count()
      }
      val (dropMs, dropCalls, _) = shape(tbl.dropPartitions(_ == "part=3"))
      val (owMs, owCalls, _) = shape(tbl.insertOverwritePartitions(
        batch.filter(col("part") === "11").withColumn("o_orderstatus", lit("W"))))
      val postDrop = GraftTable(spark, cfgT)
      val dropped = postDrop.timeline.liveFiles(None).count(_.partition == "part=3")
      tbl.dropIfExists()
      val line = s"""{"partitions":$np,"files":$nFiles,""" +
        s""""insert":{"wall_ms":${f1(insMs)},"fs":$insCalls},""" +
        s""""cold_resolve":{"wall_ms":${f1(coldMs)},"fs":$coldCalls},""" +
        s""""pruned_read":{"wall_ms":${f1(readMs)},"fs":$readCalls,"rows":$readRows,"partition_files":$expect},""" +
        s""""drop_partition":{"wall_ms":${f1(dropMs)},"fs":$dropCalls,"files_after_drop":$dropped},""" +
        s""""overwrite_one_partition":{"wall_ms":${f1(owMs)},"fs":$owCalls}}"""
      println(line)
      line
    }
    val doc =
      s"""{"metric":"partition_axis","unit":"ms","sf":"$sfDir","note":"pruned_read/drop_partition/overwrite_one_partition FS calls must stay ~flat while partition count grows; insert is O(#partitions) by design (one file per partition)","rows":[${rows.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), doc + "\n")
    println(s"wrote $outPath")
    spark.stop()
  }
}
