package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Dev tool: time a subset of SparkEntry queries (args = names), N runs
  * each (run1 cold, run2.. warm; SPARK_GRAFT_BENCH_RUNS, default 2 — the
  * triage protocol uses 4 and grades the BEST warm run, cutting the
  * single-sample variance that kept producing "partial" attribution
  * verdicts), at SPARK_GRAFT_SF_DIR. Not part of the driver contract. */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // same extension surface as Bench: the SQL-DML ops (t_sql_pipeline)
      // need the graft catalog + rules
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tableNames.foreach(t => GraftSession.table(spark, sfDir, t).limit(1000).count())
    val qs = SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        // toRdd, not count(): count() lets Catalyst drop count-invariant
        // suffixes (unique-key left joins, sorts, all unreferenced
        // columns) and time a fraction of the op — see Bench.scala
        fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"[benchsome] $name run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
