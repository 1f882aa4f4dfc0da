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
    * Timestamp handling is adaptive because the driver has shipped two
    * generations of testdata:
    *  - TIMESTAMP(NANOS) (`events.ts` only), which Spark 4 does not read
    *    natively — read as a nanos long (legacy conf) and convert with
    *    integer division (double division would lose precision at 1e18);
    *  - timestamp[us] with isAdjustedToUTC=false, which Spark reads as
    *    TIMESTAMP_NTZ — cast to session-local TIMESTAMP (session TZ is
    *    pinned to UTC, so wall-clock values are preserved bit-for-bit and
    *    downstream operators keep a single timestamp type).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // gen-1: TIMESTAMP(NANOS)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType => // gen-2: timestamp[us]
          raw.withColumn("ts", raw.col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else {
      // other tables pass through untouched: their NTZ timestamps behave
      // identically under the pinned-UTC session and the DuckDB oracle
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
