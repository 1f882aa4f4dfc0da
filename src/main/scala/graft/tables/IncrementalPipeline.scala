package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Resumable incremental processing between GraftTables — the reference's
  * central Hudi pattern (flink Hudi2HudiDataPipeline.java, DeltaStreamer
  * chaining): each run reads ONLY the upstream commits since the persisted
  * watermark, transforms them, and merges into the target. Cost per run is
  * O(changed data), never O(table) — this is what makes derived tables
  * maintainable at 100 TB.
  *
  * The watermark (last applied upstream instant) is stored in the TARGET
  * table's `_graft/` directory and saved after `apply` succeeds. A run that
  * crashes between apply and the watermark write reprocesses the same
  * increment — harmless when `apply` is idempotent (the default keyed
  * upsert), but ADDITIVE merges (aggregate maintenance) would double-count
  * that increment: such pipelines should guard by recording the applied
  * range in the target (e.g. a column or side table keyed by the range) or
  * accept at-least-once semantics. Making the watermark part of the target
  * commit's metadata (atomic exactly-once) is a planned timeline extension.
  */
object IncrementalPipeline {

  private val mapper = new ObjectMapper()

  private def watermarkPath(target: GraftTable, sourceId: String): Path =
    new Path(s"${target.cfg.path}/_graft/watermark_$sourceId.json")

  def lastApplied(target: GraftTable, sourceId: String): Option[String] = {
    val fs = new Path(target.cfg.path).getFileSystem(
      target.spark.sparkContext.hadoopConfiguration)
    val p = watermarkPath(target, sourceId)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      Some(mapper.readTree(new String(bytes, "UTF-8")).get("instant").asText())
    }
  }

  private def saveWatermark(target: GraftTable, sourceId: String, instant: String): Unit = {
    val fs = new Path(target.cfg.path).getFileSystem(
      target.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(watermarkPath(target, sourceId), true)
    out.write(s"""{"instant": "$instant"}""".getBytes("UTF-8"))
    out.close()
  }

  /** Process everything upstream since the watermark. `transform` maps the
    * incremental rows (latest state of changed records) to the target's
    * shape; `apply` lands them (defaults to upsert; pass a custom fn for
    * aggregate maintenance via merge). Returns the (from, to] range applied,
    * or None when the target is already caught up. */
  def advance(
      source: GraftTable,
      target: GraftTable,
      sourceId: String)(
      transform: DataFrame => DataFrame,
      apply: (GraftTable, DataFrame) => Unit = (t, df) => { t.upsert(df); () })
      : Option[(String, String)] = {
    val from = lastApplied(target, sourceId).getOrElse(Timeline.pad(0))
    val to = source.timeline.latestInstant().getOrElse(return None)
    if (to <= from) return None
    val delta = transform(source.incremental(from, to))
    apply(target, delta)
    saveWatermark(target, sourceId, to)
    Some((from, to))
  }
}
