package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.streaming.{AsyncServices, DeltaStream}
import graft.tables.{GraftTable, GraftTableConfig, TableType}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven DeltaStream ingest surface (the reference's
  * HoodieDeltaStreamer analogue) and the async table services it can
  * schedule. Kafka itself cannot run here, so the `kafka` short name
  * resolves to a test stub speaking the exact wire schema — the contract
  * under test is graft's: option passthrough, JSON payload decode,
  * checkpointed-offset + batch-id exactly-once, async compaction under
  * concurrent ingest. */
class DeltaStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", "4").getOrCreate()
    // sequential AvailableNow runs share each checkpoint here; the previous
    // query's ASYNC log purge must not race the next run's metadata log
    s.conf.set("spark.sql.streaming.asyncLogPurge.enabled", "false")
    s
  }

  override def afterAll(): Unit = spark.stop()

  private val payloadSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", LongType),
    StructField("ts", LongType)))

  private def writeRecords(dir: String, file: String, recs: Seq[(Long, Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val lines = recs.map { case (id, v, ts) => s"""{"id": $id, "v": $v, "ts": $ts}""" }
    Files.write(Paths.get(dir, file),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }

  /** INTEGRATION RECIPE (env-gated; the CI path stays the wire-schema stub
    * below). To exercise the REAL Kafka connector — offsets semantics,
    * startingOffsets × maxOffsetsPerTrigger interplay, checkpointed resume:
    *
    *  1. Put the connector on the classpath (it is NOT in this sandbox):
    *     `--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2`,
    *     and run WITHOUT the test stub (src/test's KafkaStubSource also
    *     registers short name "kafka"; two providers for one name is an
    *     ambiguity error) — i.e. from a main-classpath app, not sbt test.
    *  2. Point `GRAFT_KAFKA_BOOTSTRAP` at a reachable broker and
    *     `GRAFT_KAFKA_TOPIC` at a topic pre-populated with JSON records
    *     `{"id": <long>, "v": <long>, "ts": <long>}`.
    *  3. Run this test: it ingests the topic with AvailableNow +
    *     maxOffsetsPerTrigger=500 (so one run spans SEVERAL fenced
    *     micro-batches), then re-runs from the same checkpoint and
    *     asserts zero new rows — exactly-once across restarts against
    *     real broker offsets, not the stub's.
    *
    * SANDBOX AUDIT (why this cannot run here, verified): no broker
    * binary exists on the box (no kafka/redpanda anywhere on PATH or
    * disk), none of the 287 jars under the Spark home is a Kafka
    * artifact (spark-sql-kafka-0-10, kafka-clients, commons-pool2 and
    * the token-provider are all absent), the local coursier/ivy caches
    * hold no kafka coordinates, and dependency resolution runs with
    * COURSIER_MODE=offline behind zero egress — so neither the broker
    * nor the connector can be obtained. The recipe above is therefore
    * exercised up to the format-resolution boundary by the wire-schema
    * stub; everything graft-side (option passthrough, payload decode,
    * batch-id fencing, checkpointed resume) is covered by the
    * non-gated tests in this spec.
    */
  test("INTEGRATION (env-gated): DeltaStream exactly-once against a real Kafka broker") {
    assume(sys.env.contains("GRAFT_KAFKA_BOOTSTRAP"),
      "set GRAFT_KAFKA_BOOTSTRAP (and GRAFT_KAFKA_TOPIC) to run the real-broker path")
    val topic = sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "graft_it")
    val cp = Files.createTempDirectory("graft_it_cp").toString
    val out = "/tmp/graft_spec/delta_stream_it"
    val tbl = GraftTable(spark, GraftTableConfig(out, "id", "ts"))
    tbl.dropIfExists()
    val cfg = DeltaStream.Config(
      sourceFormat = "kafka",
      sourceOptions = Map(
        "kafka.bootstrap.servers" -> sys.env("GRAFT_KAFKA_BOOTSTRAP"),
        "subscribe" -> topic,
        "startingOffsets" -> "earliest",
        "maxOffsetsPerTrigger" -> "500"),
      targetPath = out,
      checkpoint = cp,
      payloadSchema = Some(payloadSchema),
      tableOptions = Map("graft.key" -> "id", "graft.precombine" -> "ts"))
    DeltaStream.start(spark, cfg).query.awaitTermination()
    val afterFirst = tbl.read().count()
    assert(afterFirst > 0, "topic must be pre-populated for the integration run")
    // restart from the same checkpoint: no topic growth -> no new rows
    DeltaStream.start(spark, cfg).query.awaitTermination()
    assert(tbl.read().count() == afterFirst,
      "checkpointed resume re-ingested already-committed offsets")
  }

  test("kafka-source config: options pass through, JSON payload decodes, batches fence") {
    val src = Files.createTempDirectory("graft_ds_kafka").toString
    val cp = Files.createTempDirectory("graft_ds_cp").toString
    val out = "/tmp/graft_spec/delta_stream"
    val tbl = GraftTable(spark, GraftTableConfig(out, "id", "ts"))
    tbl.dropIfExists()

    val cfg = DeltaStream.Config(
      sourceFormat = "kafka",
      sourceOptions = Map(
        "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
        "subscribe" -> "orders",
        "startingOffsets" -> "earliest",
        "kafka.security.protocol" -> "PLAINTEXT",
        "stub.dir" -> src),
      targetPath = out,
      checkpoint = cp,
      tableOptions = Map("graft.key" -> "id", "graft.precombine" -> "ts"),
      payloadSchema = Some(payloadSchema))

    writeRecords(src, "w1.jsonl", (1L to 100L).map(i => (i, i * 10, 1L)))
    DeltaStream.start(spark, cfg).query.awaitTermination()

    // consumer configs reached the source VERBATIM (the reference's whole
    // kafka surface is option passthrough — this is the contract)
    assert(KafkaStubSource.lastOptions("kafka.bootstrap.servers") ==
      "broker-1:9092,broker-2:9092")
    assert(KafkaStubSource.lastOptions("subscribe") == "orders")
    assert(KafkaStubSource.lastOptions("startingOffsets") == "earliest")
    assert(KafkaStubSource.lastOptions("kafka.security.protocol") == "PLAINTEXT")

    // the JSON payload became table rows
    assert(tbl.read().count() == 100)
    assert(tbl.read().filter(col("id") === 7L).head().getAs[Long]("v") == 70L)

    // wave 2 upserts through the same checkpoint: only the NEW offsets run
    writeRecords(src, "w2.jsonl", (90L to 120L).map(i => (i, i * 10 + 1, 2L)))
    DeltaStream.start(spark, cfg).query.awaitTermination()
    assert(tbl.read().count() == 120)
    assert(tbl.read().filter(col("id") === 95L).head().getAs[Long]("v") == 951L)

    // crash replay: drop the checkpoint's last batch-commit marker, so the
    // engine re-runs that batch from its checkpointed offsets. The sink's
    // batch-id fence must skip it — the TIMELINE stays unchanged (an
    // un-fenced sink would append a duplicate commit).
    val commits = tbl.timeline.instants()
    val commitMarkers = Files.list(Paths.get(cp, "commits")).iterator()
    val latest = {
      var m: java.nio.file.Path = null
      while (commitMarkers.hasNext) {
        val p = commitMarkers.next()
        if (!p.getFileName.toString.startsWith(".") &&
            (m == null || p.getFileName.toString > m.getFileName.toString)) m = p
      }
      m
    }
    Files.delete(latest)
    // the local checksum FS keeps a .crc sidecar; a real HDFS crash loses
    // both — drop it so the replayed write can land
    val crc = latest.resolveSibling("." + latest.getFileName + ".crc")
    Files.deleteIfExists(crc)
    DeltaStream.start(spark, cfg).query.awaitTermination()
    assert(tbl.timeline.instants() == commits,
      "a replayed micro-batch must be fenced by its batch id, not re-applied")
    assert(tbl.read().count() == 120)
  }

  test("continuous mode keeps consuming new offsets until stopped") {
    val src = Files.createTempDirectory("graft_ds_cont").toString
    val cp = Files.createTempDirectory("graft_ds_cont_cp").toString
    val out = "/tmp/graft_spec/delta_stream_cont"
    val tbl = GraftTable(spark, GraftTableConfig(out, "id", "ts"))
    tbl.dropIfExists()
    val cfg = DeltaStream.Config(
      sourceFormat = "kafka",
      sourceOptions = Map("subscribe" -> "orders", "stub.dir" -> src),
      targetPath = out,
      checkpoint = cp,
      tableOptions = Map("graft.key" -> "id", "graft.precombine" -> "ts"),
      payloadSchema = Some(payloadSchema),
      continuous = true,
      triggerMs = 100L)
    writeRecords(src, "w1.jsonl", (1L to 20L).map(i => (i, i, 1L)))
    val running = DeltaStream.start(spark, cfg)
    try {
      def waitFor(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 300000L // generous: full-suite runs under load flaked at 120 s once
        while (tbl.timeline.latestInstant().isEmpty ||
          tbl.read().count() < n) {
          assert(System.currentTimeMillis() < deadline, s"timed out waiting for $n rows")
          Thread.sleep(100L)
        }
      }
      waitFor(20L)
      // the job is NOT drained-and-stopped: a later wave flows through the
      // same running query (the --continuous contract)
      writeRecords(src, "w2.jsonl", (21L to 35L).map(i => (i, i, 2L)))
      waitFor(35L)
      assert(running.query.isActive)
    } finally running.close()
    assert(tbl.read().count() == 35)
  }

  test("async table services: compaction runs under concurrent MOR ingest, no lost commits") {
    val out = "/tmp/graft_spec/async_services"
    val tbl = GraftTable(spark, GraftTableConfig(
      out, "o_orderkey", "o_orderkey", tableType = TableType.Mor))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
    tbl.insert(orders, numFiles = 2)

    val services = new AsyncServices(
      tbl, targetRows = 1000000L, deltaCommits = 2, deltaSeconds = 3600L,
      pollMs = 25L).start()
    try {
      // 8 ingest waves land WHILE the service thread compacts between them;
      // MOR deltas add files only, so neither side can conflict the other
      (1 to 8).foreach { i =>
        tbl.upsert(orders.limit(40).withColumn("o_orderstatus", lit(s"S$i")))
        Thread.sleep(40L)
      }
      // wait until the trigger has fired at least once against the waves
      val deadline = System.currentTimeMillis() + 300000L // generous: full-suite runs under load flaked at 120 s once
      while (services.compactionsRun == 0 && services.failure.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(25L)
    } finally services.close() // throws if the service thread failed

    assert(services.compactionsRun >= 1, "NUM_OR_TIME trigger never fired")
    // no lost commits: all 9 ingest commits AND the compactions are on the
    // timeline, and the final state reflects the last wave
    val ops = tbl.timeline.instants().map(i => tbl.timeline.readCommit(i).op)
    assert(ops.count(_ != "compact") == 9, s"ingest commits lost: $ops")
    assert(ops.contains("compact"), s"compaction commit lost: $ops")
    assert(tbl.read().count() == orders.count())
    assert(tbl.read().filter(col("o_orderstatus") === "S8").count() == 40)
  }

  test("async clustering: sort rewrite runs under concurrent MOR ingest, no lost commits") {
    val out = "/tmp/graft_spec/async_cluster"
    val tbl = GraftTable(spark, GraftTableConfig(
      out, "o_orderkey", "o_orderkey", tableType = TableType.Mor))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
    tbl.insert(orders, numFiles = 4)

    val services = new AsyncServices(
      tbl, targetRows = 0L, pollMs = 25L, // compaction off: clustering only
      asyncCluster = true, clusterSortCols = Seq("o_orderkey"),
      clusterNumFiles = 2, clusterDeltaCommits = 2).start()
    try {
      // ingest waves land WHILE the clusterer rewrites the layout; MOR
      // deltas add files only, so live writes never lose to the clusterer
      (1 to 8).foreach { i =>
        tbl.upsert(orders.limit(40).withColumn("o_orderstatus", lit(s"C$i")))
        Thread.sleep(40L)
      }
      val deadline = System.currentTimeMillis() + 300000L
      while (services.clusteringsRun == 0 && services.failure.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(25L)
    } finally services.close() // throws if the service thread failed

    assert(services.clusteringsRun >= 1, "clustering trigger never fired")
    val ops = tbl.timeline.instants().map(i => tbl.timeline.readCommit(i).op)
    assert(ops.count(_ != "cluster") == 9, s"ingest commits lost: $ops")
    assert(ops.contains("cluster"), s"clustering commit lost: $ops")
    // content is a pure reorganization: same keys, last wave visible
    assert(tbl.read().count() == orders.count())
    assert(tbl.read().filter(col("o_orderstatus") === "C8").count() == 40)
  }

  test("async index maintenance: index dirs stay bounded under live ingest, lookups exact") {
    // a continuously-ingesting table accumulates one RLI + one SI dir per
    // commit; the service's index-fold trigger must keep the dir counts
    // (= per-lookup index reads) bounded WITHOUT manual compaction, while
    // lookups stay exact across {merged ∪ unfolded} at every moment
    val out = "/tmp/graft_spec/async_index_fold"
    val tbl = GraftTable(spark, GraftTableConfig(
      out, "o_orderkey", "o_orderkey", tableType = TableType.Mor,
      recordIndexBuckets = 4, secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
    tbl.insert(orders, numFiles = 2)

    val services = new AsyncServices(
      tbl, targetRows = 0L, pollMs = 25L, indexFoldDirs = 4).start()
    try {
      (1 to 12).foreach { i =>
        tbl.upsert(orders.limit(40).withColumn("o_orderstatus", lit(s"F$i")))
        // lookups CONCURRENT with the service's folds: the fold-marker
        // guard must keep every answer exact whether a fold's adopt
        // renames are mid-flight or not (a raced read retries or falls
        // back — it never trusts a half-moved index)
        assert(tbl.pointLookup(Seq(1L)).count() == 1,
          s"point lookup lost a row while folds ran (iteration $i)")
        Thread.sleep(40L)
      }
      val deadline = System.currentTimeMillis() + 300000L
      while (services.indexFoldsRun == 0 && services.failure.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(25L)
    } finally services.close()

    assert(services.indexFoldsRun >= 1, "index-fold trigger never fired")
    // 13 commits landed; without folds each index would hold 13 dirs
    val rli = new java.io.File(s"$out/_graft/rli").listFiles().count(_.isDirectory)
    val si = new java.io.File(s"$out/_graft/si/o_orderpriority")
      .listFiles().count(_.isDirectory)
    assert(rli <= 10, s"RLI dirs unbounded under ingest: $rli")
    assert(si <= 10, s"SI dirs unbounded under ingest: $si")
    // exactness across merged + since-fold dirs
    assert(tbl.pointLookup(Seq(1L)).count() == 1)
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() ==
      tbl.read().filter(col("o_orderpriority") === "1-URGENT").count())
    assert(tbl.read().filter(col("o_orderstatus") === "F12").count() == 40)
  }

  test("async clustering: consistent-hash bucket split under live ingest (online resize)") {
    val out = "/tmp/graft_spec/async_cluster_bkt"
    val tbl = GraftTable(spark, GraftTableConfig(
      out, "o_orderkey", "o_orderkey", numBuckets = 4, tableType = TableType.Mor))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, "/root/testdata/sf0.001", "orders")
    tbl.insert(orders)
    // the reference scenario (flink consistent_hashing.sql:51-99): ingest
    // keeps writing while the scheduled clustering splits hot buckets.
    // Waves target ONE bucket so its live rows outgrow 2x the average.
    val hot = orders.filter(pmod(xxhash64(col("o_orderkey")), lit(4)) === 0)

    val services = new AsyncServices(
      tbl, targetRows = 0L, pollMs = 25L,
      asyncCluster = true, clusterDeltaCommits = 2).start()
    try {
      (1 to 8).foreach { i =>
        tbl.upsert(hot.withColumn("o_orderstatus", lit(s"B$i")))
        Thread.sleep(40L)
      }
      val deadline = System.currentTimeMillis() + 300000L
      while (services.clusteringsRun == 0 && services.failure.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(25L)
    } finally services.close()

    assert(services.clusteringsRun >= 1, "bucket-split trigger never fired")
    val ops = tbl.timeline.instants().map(i => tbl.timeline.readCommit(i).op)
    assert(ops.contains("split_bucket"), s"split commit lost: $ops")
    assert(ops.count(o => o != "split_bucket") == 9, s"ingest commits lost: $ops")
    // the split folded the hot bucket into the doubled modulus without
    // losing a row or an update
    assert(tbl.read().count() == orders.count())
    assert(tbl.read().filter(col("o_orderstatus") === "B8").count() == hot.count())
  }
}
