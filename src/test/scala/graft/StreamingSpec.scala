package graft

import java.nio.file.Files

import graft.streaming.{StreamingOps, StreamIngest}
import graft.streaming.StreamIngest.SessionEvent
import graft.tables.{GraftTable, GraftTableConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Real Structured Streaming runs: file-source micro-batches → windowed agg
  * / GraftTable ingest / stateful sessionization, each compared against its
  * batch twin. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** Events (ts already micros) written as 3 time-ordered parquet chunks —
    * a replayable "topic". */
  private def stage(name: String): String = {
    val dir = Files.createTempDirectory(s"graft_stream_$name").toString
    val ev = GraftSession.table(spark, sfDir, "events").orderBy("ts")
    ev.withColumn("chunk", ntile(3).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts")))
      .write.mode("overwrite").partitionBy("chunk").parquet(dir)
    dir
  }

  private def readStreamOf(dir: String) = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).option("basePath", dir).parquet(s"$dir/chunk=*")
  }

  test("streaming windowed agg with watermark equals the batch twin") {
    val dir = stage("agg")
    val stream = StreamingOps.windowAgg(
      readStreamOf(dir).withWatermark("ts", "2 hours"))
    val q = stream.writeStream
      .format("memory").queryName("win_agg")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("win_agg").orderBy("win_start", "event_type")
    val want = StreamingOps.stWindowAgg(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming sliding (hop) window agg equals the batch twin") {
    val dir = stage("hop")
    val stream = readStreamOf(dir).withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n"), col("total_value"))
    val q = stream.writeStream
      .format("memory").queryName("hop_agg")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("hop_agg")
    val want = StreamingOps.stHopWindow(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"hop window mismatch: got ${got.count()}, want ${want.count()}")
  }

  test("streaming hourly counts feed the anomaly detector identically to batch") {
    val dir = stage("anomaly")
    val hourly = readStreamOf(dir).withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour"), col("event_type"), col("cnt"))
    val q = hourly.writeStream
      .format("memory").queryName("anomaly_hourly")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // re-root the memory-sink table: its MemoryPlan reuses attribute ids
    // across both branches of anomalyFrom's self-reference, which trips
    // the analyzer's conflicting-references check
    val hourly2 = spark.createDataFrame(
      spark.table("anomaly_hourly").rdd, spark.table("anomaly_hourly").schema)
    val got = StreamingOps.anomalyFrom(hourly2)
    val want = StreamingOps.stAnomaly(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("streaming ingest lands every event in a GraftTable (DeltaStreamer analogue)") {
    val dir = stage("ingest")
    val tbl = GraftTable(spark, GraftTableConfig(
      s"/tmp/graft_spec/stream_ingest", "event_id", "event_id"))
    tbl.dropIfExists()
    val cp = Files.createTempDirectory("graft_cp").toString
    val q = StreamIngest.toGraftTable(readStreamOf(dir).drop("chunk"), tbl, cp)
    q.awaitTermination()
    val want = GraftSession.table(spark, sfDir, "events")
    assert(tbl.read().count() == want.count())
    // multiple commits on the timeline — one per micro-batch
    assert(tbl.timeline.instants().nonEmpty)
    // idempotent redelivery: re-upserting a batch changes nothing
    tbl.upsert(want.limit(100))
    assert(tbl.read().count() == want.count())
  }

  test("stateful streaming sessionization agrees with the batch twin on closed sessions") {
    import spark.implicits._
    val dir = stage("sess")
    val evStream = readStreamOf(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
    val q = StreamIngest.sessionize(evStream, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("sess_out")
      .select("user_id", "sess_id", "start_ms", "end_ms", "n_events")
    // batch twin: all sessions except each user's last (still open in streaming)
    val batch = StreamingOps.stSessionize(spark, sfDir)
    val lastPerUser = batch.groupBy("user_id").agg(max("sess_id").as("sess_id"))
    val want = batch.join(lastPerUser, Seq("user_id", "sess_id"), "leftanti")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"closed sessions mismatch: got ${got.count()}, want ${want.count()}")
  }

  test("stateful pattern detection (view→purchase) matches the batch window twin") {
    import spark.implicits._
    val dir = stage("pattern")
    val evStream = readStreamOf(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[StreamIngest.KeyedEvent]
    val q = StreamIngest.detectPattern(evStream, windowSec = 600)
      .writeStream.format("memory").queryName("pattern_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the per-purchase emissions aggregate to exactly the batch report
    val got = spark.table("pattern_out")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("converted"), 1L).otherwise(0L)).as("n_converted"))
    val want = StreamingOps.stPattern(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"pattern mismatch: got ${got.count()} users, want ${want.count()}")
  }

  test("stateful temporal-table join matches the batch as-of window twin") {
    import spark.implicits._
    val dir = stage("temporal")
    val evStream = readStreamOf(dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"),
        // a missing $.k stays NULL -> None: the sentinel-free missing-field
        // marker (a real negative version would carry, like the batch twin)
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .as[StreamIngest.VersionedEvent]
    val q = StreamIngest.temporalJoin(evStream)
      .writeStream.format("memory").queryName("temporal_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("temporal_out")
      .select("event_id", "user_id", "ts_ms", "plan_k")
    val want = StreamingOps.stTemporalJoin(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"temporal join mismatch: got ${got.count()} rows, want ${want.count()}")
  }

  test("stateful latest-per-key stream converges to the batch q_latest_per_key") {
    import spark.implicits._
    // chunk by event_id % 3, NOT by time: most users then receive OLDER
    // events in later micro-batches, so the final answer is only right if
    // per-key state survives and wins across batches
    val dir = Files.createTempDirectory("graft_stream_latest").toString
    GraftSession.table(spark, sfDir, "events")
      .withColumn("chunk", col("event_id") % 3)
      .write.mode("overwrite").partitionBy("chunk").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val evStream = spark.readStream.schema(schema)
      .option("basePath", dir).option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk=*")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[StreamIngest.KeyedEvent]
    // fold each micro-batch's updates into a last-write-wins driver map —
    // the stream's FINAL per-key emission is the state's final content
    val finalRows = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, String)]()
    val q = StreamIngest.latestPerKey(evStream)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamIngest.LatestOut], _: Long) =>
        batch.collect().foreach(r =>
          finalRows.put(r.user_id, (r.event_id, r.ts_ms, r.event_type)))
        ()
      }
      .start()
    q.awaitTermination()
    val want = graft.operators.Queries.qLatestPerKey(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(finalRows.size == want.size, s"${finalRows.size} users vs ${want.size}")
    want.foreach { case (u, exp) =>
      assert(finalRows.get(u) == exp, s"user $u: got ${finalRows.get(u)}, want $exp")
    }
  }

  test("stateful changelog apply converges to the batch snapshot (deletes win, upserts resurrect)") {
    import spark.implicits._
    // same adversarial chunking as latest-per-key: later micro-batches
    // deliver mostly OLDER changes, so correctness needs cross-batch state
    val dir = Files.createTempDirectory("graft_stream_chglog").toString
    GraftSession.table(spark, sfDir, "events")
      .withColumn("chunk", col("event_id") % 3)
      .write.mode("overwrite").partitionBy("chunk").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val evStream = spark.readStream.schema(schema)
      .option("basePath", dir).option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk=*")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[StreamIngest.KeyedEvent]
    // fold per-key emissions last-write-wins; deleted keys leave the map
    val live = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, String)]()
    val q = StreamIngest.applyChangelog(evStream)
      .writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamIngest.ChangeOut], _: Long) =>
        batch.collect().foreach { r =>
          if (r.live) live.put(r.user_id, (r.event_id, r.ts_ms, r.event_type))
          else live.remove(r.user_id)
        }
        ()
      }
      .start()
    q.awaitTermination()
    val want = graft.streaming.StreamingOps.stChangelogApply(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(live.size == want.size, s"${live.size} live keys vs ${want.size}")
    want.foreach { case (u, exp) =>
      assert(live.get(u) == exp, s"user $u: got ${live.get(u)}, want $exp")
    }
    // sanity: the tombstone path actually fired — some keys ended deleted
    val allKeys = spark.read.parquet(dir).select("user_id").distinct().count()
    assert(want.size < allKeys, s"no deletes exercised: $allKeys keys, ${want.size} live")
  }

  test("streaming ingest with inline compaction keeps the file count bounded") {
    val dir = stage("ingest_compact")
    val tbl = GraftTable(spark, GraftTableConfig(
      s"/tmp/graft_spec/stream_ingest_compact", "event_id", "event_id"))
    tbl.dropIfExists()
    val cp = Files.createTempDirectory("graft_cp_c").toString
    // rate-limited ingest (one file per micro-batch) so the stream produces
    // a run of delta commits for the trigger to observe
    val schema = spark.read.parquet(dir).schema
    val throttled = spark.readStream.schema(schema)
      .option("basePath", dir).option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/chunk=*")
    val q = StreamIngest.toGraftTable(throttled.drop("chunk"), tbl, cp,
      compactTargetRows = 10000000L, compactEvery = 2)
    q.awaitTermination()
    val want = GraftSession.table(spark, sfDir, "events")
    assert(tbl.read().count() == want.count())
    // a compact commit fired and bin-packed the stream's delta files
    val ops = tbl.history().select("op").collect().map(_.getString(0)).toSeq
    assert(ops.contains("compact"), s"expected a compact commit in $ops")
    assert(tbl.timeline.liveFiles(None).size <= 2,
      s"live files not bin-packed: ${tbl.timeline.liveFiles(None).size}")
  }

  test("streaming dedup with watermark restores exactly-once from doubled delivery") {
    val dir = stage("dedup")
    // at-least-once delivery: two sources over the same chunks, unioned
    val doubled = readStreamOf(dir).unionAll(readStreamOf(dir))
    val stream = StreamingOps.dedupExact(
      doubled.withWatermark("ts", "2 hours")
        .select("event_id", "user_id", "event_type", "value", "ts"))
    val q = stream.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("dedup_out").select("event_id", "user_id", "event_type", "value")
    val want = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"dedup mismatch: got ${got.count()}, want ${want.count()}")
  }

  test("stream-static enrichment joins each micro-batch against the broadcast dim") {
    val dir = stage("enrich")
    val dim = GraftSession.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = readStreamOf(dir)
      .select("event_id", "user_id", "event_type")
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))
    val q = enriched.writeStream
      .format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("enrich_out").orderBy("event_id").collect()
    val want = StreamingOps.stEnrich(spark, sfDir)
      .select("event_id", "user_id", "event_type", "segment")
      .orderBy("event_id").collect()
    assert(got.sameElements(want), s"got ${got.length} rows, want ${want.length}")
  }

  test("stream-stream interval join matches the batch twin") {
    val dir = stage("ssjoin")
    val v = readStreamOf(dir).filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val p = readStreamOf(dir).filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    val joined = v.join(p, expr(
      """v_user = p_user AND
        |view_ts <= purchase_ts AND
        |view_ts >= purchase_ts - INTERVAL 1 HOUR""".stripMargin))
      .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"))
    val q = joined.writeStream
      .format("memory").queryName("ssjoin_out")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("ssjoin_out").orderBy("view_id", "purchase_id").collect()
    val want = StreamingOps.stStreamJoin(spark, sfDir).collect()
    assert(got.sameElements(want), s"got ${got.length} rows, want ${want.length}")
  }
}
