package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: sampling profiler for the commit write path — runs N warm
  * upserts while a background thread samples every thread's stack, then
  * prints the hottest collapsed frames. Identifies driver-side commit cost
  * (planning vs committer vs FS vs codegen) empirically. Not part of the
  * driver contract. */
object ProfileWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same FS as Bench, so the profile sees the bench's IO path
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.CountingLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = GraftSession.table(spark, sfDir, "orders")
    orders.count()

    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_prof/pw", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    // warm the upsert path
    tbl.upsert(orders.filter(col("o_orderkey") % 13 === 1)
      .withColumn("o_orderstatus", lit("W")))

    val samples = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    @volatile var sampling = true
    val mainThread = Thread.currentThread()
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        // collapse: take the deepest interesting frames
        val frames = st.iterator.map(_.toString).toSeq
        val key =
          if (frames.exists(_.contains("Shell.runCommand")))
            "FORK: " + frames.dropWhile(!_.contains("execCommand"))
              .filterNot(_.contains("hadoop.util.Shell"))
              .take(8).mkString(" <- ")
          else frames
            .filterNot(f => f.startsWith("java.") || f.startsWith("jdk.") ||
              f.startsWith("scala.collection"))
            .take(6).mkString(" <- ")
        samples.computeIfAbsent(key, _ => new java.util.concurrent.atomic.LongAdder).increment()
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)

    graft.sources.FsCalls.phaseWallReset()
    val t0 = System.nanoTime()
    sampler.start()
    (2 to 13).foreach { i =>
      tbl.upsert(orders.filter(col("o_orderkey") % 13 === i)
        .withColumn("o_orderstatus", lit(s"W$i")))
    }
    sampling = false
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[profwrite] 12 upserts in $dt%.2f s (${dt / 12}%.3f s each)")
    val pw = graft.sources.FsCalls.phaseWall().toSeq.sortBy(-_._2)
    println("[profwrite] phase wall: " + pw.map { case (k, v) => f"$k=$v%.2fs" }.mkString(" "))
    import scala.jdk.CollectionConverters._
    samples.asScala.toSeq.map { case (k, v) => (v.sum(), k) }.sortBy(-_._1)
      .take(24).foreach { case (n, k) => println(f"[profwrite] $n%5d  $k") }
    spark.stop()
  }
}
