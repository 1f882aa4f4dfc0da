package graft

import java.nio.file.Files

import graft.streaming.StreamIngest
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The reference's full continuous-pipeline story in one flow
  * (DeltaStreamer continuous mode + Hudi2Hudi chaining): a replayable
  * event stream ingests into a MOR GraftTable micro-batch by micro-batch,
  * NUM_OR_TIME compaction folds the accumulating deltas, and a watermarked
  * incremental pipeline keeps a derived per-user aggregate current —
  * everything verified against batch ground truth at the end. */
class EndToEndSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("battery sweep leaves no cached RDDs behind (per-op cache scope)") {
    // Ops may cache intermediates that feed multiple branches of their
    // plan; because the returned DataFrame is lazy, the op itself cannot
    // unpersist. The per-op scope lives in the battery runners (Bench /
    // Verify / BenchSome all clearCache() after materializing each op) —
    // this pins that the scope actually empties the cache, including for
    // the cache-heaviest ops.
    for (name <- Seq("d_minhash_lsh", "q2_min_cost_supplier", "d_semdedup",
        "d_minhash_est", "d_lsh_tuning", "x_ngram_novelty")) {
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
    }
    val cached = spark.sparkContext.getPersistentRDDs.values
      .filterNot(_.name == null)
      .filterNot(_.name.contains("Checkpoint")) // d_dup_groups-style localCheckpoints are dropped by the ContextCleaner, not clearCache
    assert(cached.isEmpty, cached.map(_.name).mkString(", "))
  }

  test("stream -> MOR table -> triggered compaction -> derived incremental aggregate") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}

    // a replayable "topic": events as 4 time-ordered chunks
    val topic = Files.createTempDirectory("graft_e2e_topic").toString
    val ev = GraftSession.table(spark, sfDir, "events")
    ev.withColumn("chunk", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy("ts")))
      .write.mode("overwrite").partitionBy("chunk").parquet(topic)

    val raw = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/e2e_raw", "event_id", "event_id", tableType = TableType.Mor))
    raw.dropIfExists()
    val agg = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/e2e_agg", "user_id", "user_id"))
    agg.dropIfExists()

    // continuous loop: each cycle ingests available stream data, runs the
    // compaction trigger, and advances the derived table incrementally
    def transform(delta: org.apache.spark.sql.DataFrame) =
      delta.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("total_value"))

    def applyMerge(t: GraftTable, d: org.apache.spark.sql.DataFrame,
        m: Map[String, String]): Unit =
      if (t.timeline.instants().isEmpty) { t.insert(d, commitMeta = m); () }
      else {
        t.merge(d, whenMatchedUpdate = Some(Seq(
          "n_events" -> (col("t.n_events") + col("s.n_events")),
          "total_value" -> (col("t.total_value") + col("s.total_value"))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))), commitMeta = m)
        ()
      }

    val schema = spark.read.parquet(topic).schema
    val cp = Files.createTempDirectory("graft_e2e_cp").toString
    (1 to 2).foreach { _ =>
      val q = StreamIngest.toGraftTable(
        spark.readStream.schema(schema).option("basePath", topic)
          .option("maxFilesPerTrigger", "2") // real micro-batches, not one blob
          .parquet(s"$topic/chunk=*").drop("chunk"),
        raw, cp)
      q.awaitTermination()
      TableServices.maybeCompact(raw, targetRows = 10000000L, deltaCommits = 2)
      IncrementalPipeline.advance(raw, agg, "events")(transform, applyMerge)
    }

    // ground truth: plain batch aggregation over the source events
    assert(raw.read().count() == ev.count())
    val got = agg.read().orderBy("user_id")
      .select(col("user_id"), col("n_events"), col("total_value").cast("double"))
    val want = ev.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("user_id")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "derived aggregate diverges from batch ground truth")
    // compaction actually ran (a compact commit is on the raw timeline)
    assert(raw.history().filter(col("op") === "compact").count() >= 1)
    // and the watermark is recorded atomically in the agg table's commits
    assert(IncrementalPipeline.lastApplied(agg, "events").nonEmpty)
  }

  test("the migration story: kafka config -> continuous MOR ingest + async compaction " +
      "-> catalog sync -> SQL, time travel, incremental") {
    import graft.streaming.DeltaStream
    import org.apache.spark.sql.types._
    val topic = Files.createTempDirectory("graft_e2e_kafka").toString
    val cp = Files.createTempDirectory("graft_e2e_kcp").toString
    val out = "/tmp/graft_spec/e2e_trips"
    val tbl = GraftTable(spark, GraftTableConfig(
      out, "uuid", "ts", tableType = TableType.Mor))
    tbl.dropIfExists()

    def wave(file: String, ids: Range, ts: Long, fare: Long => Double): Unit = {
      val lines = ids.map(i =>
        s"""{"uuid": "t-$i", "ts": $ts, "fare": ${fare(i.toLong)}}""")
      Files.write(java.nio.file.Paths.get(topic, file),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val schema = StructType(Seq(StructField("uuid", StringType),
      StructField("ts", LongType), StructField("fare", DoubleType)))

    // the reference's DeltaStreamer job, as one config object
    val running = DeltaStream.start(spark, DeltaStream.Config(
      sourceFormat = "kafka",
      sourceOptions = Map("subscribe" -> "trips", "stub.dir" -> topic),
      targetPath = out,
      checkpoint = cp,
      tableOptions = Map("graft.key" -> "uuid", "graft.precombine" -> "ts",
        "graft.type" -> "mor"),
      payloadSchema = Some(schema),
      continuous = true, triggerMs = 100L,
      asyncCompactTargetRows = 1000000L, compactDeltaCommits = 2))
    try {
      wave("w1.jsonl", 1 to 300, 1L, _.toDouble)
      val deadline = System.currentTimeMillis() + 120000L
      def waitFor(cond: => Boolean): Unit =
        while (!cond) {
          assert(System.currentTimeMillis() < deadline, "e2e ingest timed out")
          Thread.sleep(100L)
        }
      waitFor(tbl.timeline.latestInstant().nonEmpty && tbl.read().count() == 300)
      val firstCommit = tbl.timeline.instants().head
      wave("w2.jsonl", 200 to 400, 2L, _ * 10.0) // 101 updates + 100 inserts
      waitFor(tbl.read().count() == 400)
      waitFor(running.services.exists(_.compactionsRun >= 1))
    } finally running.close()

    // publish by name and query like any warehouse table
    graft.sources.CatalogSync.sync(tbl, "e2e", "trips")
    assert(spark.sql("SELECT count(*) FROM e2e.trips").head().getLong(0) == 400)
    assert(spark.sql("SELECT fare FROM e2e.trips WHERE uuid = 't-250'")
      .head().getDouble(0) == 2500.0) // the wave-2 update won (precombine ts)
    // time travel to the first commit: only wave 1 visible, original fares
    val asOf = tbl.readAsOf(tbl.timeline.instants().head)
    assert(asOf.count() == 300)
    assert(asOf.filter(col("uuid") === "t-250").head().getAs[Double]("fare") == 250.0)
    // incremental read since the first commit = exactly wave 2's rows
    val inc = tbl.incremental(tbl.timeline.instants().head, graft.tables.Timeline.MaxInstant)
    assert(inc.count() == 201)
    assert(inc.filter(col("ts") =!= 2L).count() == 0)
    // compaction folded the deltas: the read-optimized view converges
    tbl.compact(targetRows = 1000000L)
    assert(tbl.readOptimized().count() == 400)
    graft.sources.CatalogSync.unsync(spark, "e2e", "trips")
  }
}
