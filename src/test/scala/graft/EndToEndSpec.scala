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
}
