package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Session factory + table loader for the graft engine.
  *
  * Tuned for the driver's local[32] harness but with settings that hold on a
  * real cluster: AQE (coalesce partitions, skew-join split) is on, shuffle
  * partitions default low for local runs (on a cluster you'd size this to
  * ~2-3x total cores), and parquet pushdown/pruning are left at their
  * Catalyst defaults — every operator here is written so filters and column
  * pruning reach the scan.
  */
object GraftSession {

  def builder(appName: String = "graft", cores: String = "32"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // standard TIMESTAMP(MICROS) instead of legacy INT96: footer min/max
      // stats exist and are harvestable for data skipping (INT96 carries no
      // usable stats and is deprecated across the ecosystem)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val s = builder(appName).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The TPC-H-ish testdata tables (see TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table from a scale-factor directory.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4 does
    * not read natively — we read it as a nanos long (legacy conf) and convert
    * to a microsecond timestamp with integer division (a double division
    * would lose precision at the 1e18 nanos magnitude).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
