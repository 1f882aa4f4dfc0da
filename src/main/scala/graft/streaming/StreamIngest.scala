package graft.streaming

import scala.collection.mutable.ListBuffer

import graft.tables.GraftTable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming ingestion into a GraftTable — the Spark-native
  * analogue of the reference's continuous DeltaStreamer pipeline
  * (DeltaStreamerExample.scala:14-62: Kafka source → upsert → table) and the
  * Flink HudiDataStreamWriter. Here the source is any streaming DataFrame
  * (file source in tests; Kafka in production — same contract).
  */
object StreamIngest {

  /** Upsert each micro-batch into the table. Exactly-once effect comes from
    * the combination of checkpointed source offsets + idempotent re-upsert
    * (re-running a batch upserts the same record keys to the same values).
    *
    * `compactTargetRows` > 0 enables inline compaction between micro-batches
    * via the NUM_OR_TIME trigger (the reference's DeltaStreamer async
    * compaction, DeltaStreamerExample.scala:49-56): every `compactEvery`
    * delta commits the small files the stream produced are bin-packed —
    * ingest latency stays flat instead of degrading as files accumulate. */
  def toGraftTable(stream: DataFrame, table: GraftTable, checkpoint: String,
      compactTargetRows: Long = 0L, compactEvery: Int = 5): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          table.upsert(batch)
          if (compactTargetRows > 0) {
            graft.tables.TableServices.maybeCompact(
              table, compactTargetRows, deltaCommits = compactEvery)
          }
          ()
        }
      }
      .start()

  final case class KeyedEvent(user_id: Long, event_id: Long, ts_us: Long, event_type: String)
  final case class LatestOut(user_id: Long, event_id: Long, ts_ms: Long, event_type: String)

  /** Streaming latest-event-per-key (mapGroupsWithState) — the stateful
    * twin of Queries.qLatestPerKey: each micro-batch updates a per-key
    * O(1) state holding the current (ts, event_id)-max event and emits the
    * key's refreshed latest row. The CDC-snapshot / feature-store pattern:
    * executor state is one row per key regardless of stream length. */
  def latestPerKey(events: Dataset[KeyedEvent]): Dataset[LatestOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) => {
          val latest = (state.getOption.iterator ++ it)
            .maxBy(e => (e.ts_us, e.event_id))
          state.update(latest)
          LatestOut(uid, latest.event_id, latest.ts_us / 1000, latest.event_type)
        })
  }

  final case class ChangeOut(
      user_id: Long, event_id: Long, ts_ms: Long, event_type: String, live: Boolean)

  /** Streaming changelog apply (mapGroupsWithState) — the stateful twin of
    * StreamingOps.stChangelogApply: per-key state holds the latest change;
    * each emission reports whether the key is LIVE (latest change is an
    * upsert) or deleted (latest is the 'error' tombstone). A later upsert
    * resurrects a deleted key, a later tombstone kills a live one — which
    * is exactly the -D/+U RowKind merge a CDC sink performs. State is one
    * row per key at any stream length. */
  def applyChangelog(events: Dataset[KeyedEvent]): Dataset[ChangeOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) => {
          val latest = (state.getOption.iterator ++ it)
            .maxBy(e => (e.ts_us, e.event_id))
          state.update(latest)
          ChangeOut(uid, latest.event_id, latest.ts_us / 1000,
            latest.event_type, latest.event_type != "error")
        })
  }

  final case class PatternState(lastViewUs: Long)
  final case class PatternOut(user_id: Long, event_id: Long, converted: Boolean)

  /** Streaming view→purchase pattern detection (flatMapGroupsWithState) —
    * the stateful twin of StreamingOps.stPattern: per-user state is ONE
    * long (the latest view timestamp), each purchase emits whether a view
    * preceded it within the window. O(1) state per key at any stream
    * length — the property that separates a CEP operator from a buffered
    * self-join. In-order delivery per key is assumed (the micro-batch
    * sort handles intra-batch disorder; cross-batch disorder is the
    * watermark's job, as in sessionize). */
  def detectPattern(
      events: Dataset[KeyedEvent],
      windowSec: Long): Dataset[PatternOut] = {
    import events.sparkSession.implicits._
    val winUs = windowSec * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[KeyedEvent], state: GroupState[PatternState]) => {
          val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var lastView = state.getOption.map(_.lastViewUs).getOrElse(Long.MinValue)
          val out = ListBuffer.empty[PatternOut]
          evs.foreach { e =>
            if (e.event_type == "view") lastView = math.max(lastView, e.ts_us)
            else if (e.event_type == "purchase")
              // the >= lastView bound fails safe on cross-batch disorder: a
              // purchase older than the stored last-view state can never be
              // "preceded" by it, matching the batch twin's strictly-
              // preceding frame (identical for in-order input)
              out += PatternOut(uid, e.event_id,
                lastView != Long.MinValue && e.ts_us >= lastView &&
                  e.ts_us - lastView <= winUs)
          }
          state.update(PatternState(lastView))
          out.iterator
        })
  }

  final case class VersionedEvent(
      user_id: Long, event_id: Long, ts_us: Long, event_type: String,
      k: Option[Long])
  final case class PlanState(k: Long)
  final case class TemporalOut(event_id: Long, user_id: Long, ts_ms: Long, plan_k: Long)

  /** Streaming event-time temporal-table join (flatMapGroupsWithState) —
    * the stateful twin of StreamingOps.stTemporalJoin. Per-user state is
    * ONE long (the latest dimension version), each probe row emits the
    * version valid at its event time: O(1) state per key where a buffered
    * stream-stream join would hold the whole dimension history. Signups
    * sort before purchases at equal ts inside a batch (as-of "<="
    * semantics, matching the batch twin's tag ordering). A version-less
    * signup (missing JSON field) is `k = None` and updates nothing; any
    * PRESENT version — negative included — carries, exactly like the
    * batch twin's ignore-nulls window, so the twins agree by construction
    * rather than by an all-versions-nonnegative assumption. Purchases
    * before any versioned signup report -1, the batch twin's COALESCE
    * default. */
  def temporalJoin(events: Dataset[VersionedEvent]): Dataset[TemporalOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[VersionedEvent], state: GroupState[PlanState]) => {
          val evs = it.toSeq.sortBy(e =>
            (e.ts_us, if (e.event_type == "signup") 0 else 1, e.event_id))
          var k = state.getOption.map(_.k).getOrElse(-1L)
          val out = ListBuffer.empty[TemporalOut]
          evs.foreach { e =>
            if (e.event_type == "signup") e.k.foreach(v => k = v)
            else if (e.event_type == "purchase")
              out += TemporalOut(e.event_id, uid, e.ts_us / 1000, k)
          }
          state.update(PlanState(k))
          out.iterator
        })
  }

  final case class SessionEvent(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessionState(sessId: Long, startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(
      user_id: Long, sess_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Gap-based sessionization with explicit state (flatMapGroupsWithState) —
    * emits a session as soon as a later event closes it. The batch twin is
    * StreamingOps.stSessionize; StreamingSpec asserts they agree on closed
    * sessions. State per user is O(1) (the open session only), so executor
    * state stays bounded at any stream length. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) => {
          val evs = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
          val closed = ListBuffer.empty[SessionOut]
          var st = state.getOption
          evs.foreach { e =>
            st match {
              case None =>
                st = Some(SessionState(1L, e.ts_us, e.ts_us, 1L))
              case Some(s) if e.ts_us - s.lastUs > gapUs =>
                closed += SessionOut(uid, s.sessId, s.startUs / 1000, s.lastUs / 1000, s.n)
                st = Some(SessionState(s.sessId + 1, e.ts_us, e.ts_us, 1L))
              case Some(s) if e.ts_us < s.startUs - gapUs =>
                // too-late data: older than any event this session could
                // absorb — dropped (the stream's watermark policy; it
                // belongs to an already-emitted session)
                ()
              case Some(s) =>
                // a late within-gap event may extend the session backwards
                // too — matches the batch twin's min(ts)
                st = Some(s.copy(
                  startUs = math.min(s.startUs, e.ts_us),
                  lastUs = math.max(s.lastUs, e.ts_us),
                  n = s.n + 1))
            }
          }
          st.foreach(state.update)
          closed.iterator
        })
  }
}
