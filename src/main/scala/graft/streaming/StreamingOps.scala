package graft.streaming

import graft.{GraftSession, QueryDef, QueryRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.G — streaming semantics (the DeltaStreamer/Kafka→table side
  * of the reference), expressed as event-time computations that run
  * identically in batch and as Structured Streaming queries.
  *
  * The `queries` entries here are the BATCH equivalents (DuckDB-checkable);
  * StreamingSpec runs the same logic through `readStream`/`writeStream`
  * micro-batches (file source, watermarks, foreachBatch into a GraftTable
  * with idempotent batch commits) and asserts stream==batch.
  */
object StreamingOps extends QueryRegistry {

  private def events(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "events")

  /** Tumbling 1-hour event-time window agg — usable verbatim under
    * `readStream` + watermark (that is what StreamingSpec does). */
  def windowAgg(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total_value"))

  // --- st_window_agg: batch twin of the streaming windowed aggregation.
  def stWindowAgg(s: SparkSession, dir: String): DataFrame =
    windowAgg(events(s, dir)).orderBy("win_start", "event_type")

  private val stWindowAggSql =
    """SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- st_hop_window: SLIDING event-time windows (1-hour length, 15-minute
  // hop) — the HOP/dashboard-refresh mechanic tumbling windows can't
  // express: every event belongs to exactly 4 overlapping windows. Spark's
  // window(ts, len, slide) expands the memberships engine-side (epoch-
  // aligned starts); the oracle states the same expansion as an explicit
  // 4-offset cross of 15-minute buckets. Usable verbatim under readStream
  // + watermark like stWindowAgg; state per key is bounded by len/slide
  // open windows, which is why the hop count — not the event rate — sizes
  // streaming memory at 100 TB/day.
  def stHopWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(unix_millis(col("window.start")).as("win_start_ms"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("win_start_ms", "event_type")

  private val stHopWindowSql =
    """WITH x AS (SELECT event_type, value,
      |    make_timestamp(epoch_us(ts) // 900000000 * 900000000) AS b
      |  FROM events),
      |e AS (SELECT event_type, value,
      |    b - INTERVAL (15 * j.j) MINUTE AS win_start
      |  FROM x, (VALUES (0), (1), (2), (3)) j(j))
      |SELECT epoch_ms(win_start) AS win_start_ms, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- st_sessionize: 30-minute-gap sessionization. Batch form: windowed
  // gap detection + cumulative session numbering (one shuffle on user_id).
  // Streaming form: flatMapGroupsWithState in StreamingSpec.
  private val GapMinutes = 30

  def stSessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > GapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(wRun))
      .groupBy("user_id", "sess_id")
      .agg(
        unix_millis(min(col("ts"))).as("start_ms"),
        unix_millis(max(col("ts"))).as("end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess_id")
  }

  private val stSessionizeSql =
    s"""WITH x AS (SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL $GapMinutes MINUTE THEN 1 ELSE 0 END AS ns
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM x)
       |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, epoch_ms(min(ts)) AS start_ms,
       |  epoch_ms(max(ts)) AS end_ms, COUNT(*) AS n_events
       |FROM y GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- st_session_window: gap-based sessions via Spark's NATIVE
  // session_window operator — the API Structured Streaming runs with
  // watermarked session state (MergingSessionsExec), here exercised on the
  // batch twin (the same expression works in both modes). Distinct from
  // st_sessionize, which builds sessions from explicit lag/island logic:
  // this one hands merging to the engine — one shuffle on the grouping
  // key, no window function at all. Boundary semantics differ from the
  // lag formulation and the oracle states them exactly: a session's end
  // is EXCLUSIVE at last-event + gap, so an event arriving at exactly
  // that instant starts a NEW session (ts - prev >= gap, not >), and the
  // reported end includes the gap padding.
  def stSessionWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$GapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("start_ms"),
        unix_millis(col("sw.end")).as("end_ms"),
        col("n_events"))
      .orderBy("user_id", "start_ms")

  private val stSessionWindowSql =
    s"""WITH x AS (SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL $GapMinutes MINUTE THEN 1 ELSE 0 END AS ns
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM x)
       |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
       |  epoch_ms(max(ts) + INTERVAL $GapMinutes MINUTE) AS end_ms, COUNT(*) AS n_events
       |FROM y GROUP BY user_id, sess_id ORDER BY user_id, start_ms""".stripMargin

  /** Exactly-once dedup of an at-least-once stream: `dropDuplicates` on the
    * event id — usable verbatim under `readStream` with a watermark bounding
    * the dedup state (StreamingSpec runs it that way over a doubled
    * stream). */
  def dedupExact(ev: DataFrame): DataFrame =
    ev.dropDuplicates("event_id")

  // --- st_dedup: batch twin over an at-least-once (doubled) delivery of
  // the events stream; dedup restores exactly-once. Duplicates are exact
  // copies, so dropDuplicates' arbitrary-row choice is deterministic.
  def stDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select("event_id", "user_id", "event_type", "value")
    dedupExact(ev.unionAll(ev)).orderBy("event_id")
  }

  private val stDedupSql =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  // --- st_late_drop: watermark late-data semantics, batch-expressible.
  // Events arrive in event_id order (the arrival proxy); the watermark is
  // the max event time seen over all PRIOR arrivals minus 15 minutes, and
  // an event older than the watermark at its arrival is dropped — exactly
  // what `withWatermark("ts", "15 minutes")` does to a streaming agg. The
  // hourly counts then cover only surviving events. In streaming the
  // watermark is O(1) engine state; the global running-max window here
  // exists only so the DuckDB oracle can state identical semantics.
  private val LateUs = 15L * 60L * 1000000L

  def stLateDrop(s: SparkSession, dir: String): DataFrame = {
    val wPrev = Window.orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn("wm_us", max(unix_micros(col("ts"))).over(wPrev) - LateUs)
      .filter(col("wm_us").isNull || unix_micros(col("ts")) >= col("wm_us"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_kept"))
      .select(col("window.start").as("win_start"), col("n_kept"))
      .orderBy("win_start")
  }

  private val stLateDropSql =
    """WITH x AS (SELECT ts,
      |    MAX(epoch_us(ts)) OVER (ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 900000000 AS wm_us
      |  FROM events)
      |SELECT date_trunc('hour', ts) AS win_start, COUNT(*) AS n_kept
      |FROM x WHERE wm_us IS NULL OR epoch_us(ts) >= wm_us
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- st_enrich: stream-static enrichment — the DeltaStreamer transformer
  // pattern (join each micro-batch against a slowly-changing dim before the
  // sink). The dim is BROADCAST: a stream-static join must not shuffle the
  // unbounded side per micro-batch. Batch twin of
  // readStream.join(staticDim); users without a customer row pass through
  // with a null segment (left join, the ingest-friendly choice).
  def stEnrich(s: SparkSession, dir: String): DataFrame = {
    val dim = GraftSession.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    events(s, dir)
      .select("event_id", "user_id", "event_type", "value")
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("c_mktsegment").as("segment"))
      .orderBy("event_id")
  }

  private val stEnrichSql =
    """SELECT event_id, user_id, event_type, c_mktsegment AS segment
      |FROM events LEFT JOIN customer ON user_id = c_custkey
      |ORDER BY event_id""".stripMargin

  // --- st_stream_join: stream-stream interval join — every view a user
  // made in the hour before each purchase (attribution). In streaming this
  // is two watermarked streams joined on key + time range (state bounded by
  // the interval); the batch twin is the identical equi-join + range
  // filter. Keyed on user_id, so state and shuffle are per-user, never a
  // cross product.
  def stStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    v.join(p, Seq("user_id"))
      .filter(col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select("user_id", "view_id", "purchase_id")
      .orderBy("view_id", "purchase_id")
  }

  private val stStreamJoinSql =
    """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY view_id, purchase_id""".stripMargin

  // --- st_window_topk: per-window top event types — the live-dashboard
  // leaderboard query. The rank window partitions by hour (cardinality
  // grows with the stream; each partition holds only the |event_type|
  // pre-aggregated counts, so per-task work is O(types), never O(events)).
  // Streaming form: the same agg under a watermark with the rank applied
  // per output mode batch.
  def stWindowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("hour_ts").orderBy(desc("n"), asc("event_type"))
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2)
      .orderBy("hour_ts", "rank")
  }

  private val stWindowTopkSql =
    """WITH c AS (SELECT date_trunc('hour', ts) AS hour_ts, event_type, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT hour_ts, event_type, n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY hour_ts
      |      ORDER BY n DESC, event_type) AS BIGINT) AS rank
      |  FROM c)
      |SELECT hour_ts, event_type, n, rank FROM r WHERE rank <= 2
      |ORDER BY hour_ts, rank""".stripMargin

  // --- st_anomaly: windowed anomaly detection — hours whose event count
  // sits more than 2 standard deviations from that event type's hourly
  // mean (the streaming-monitor alert primitive; batch twin of a windowed
  // agg + per-key baseline join). Two narrow shuffles: hourly counts
  // (map-side combined), then a #types-row baseline broadcast back. The
  // 2σ test is evaluated in PURE INTEGER arithmetic —
  // (cnt·n − sum)² > 4·(n·sumsq − sum²) ⟺ |z| > 2 — so the flag is
  // bit-exact across engines; the reported z-score is one deterministic
  // double expression from those exact integers.
  def stAnomaly(s: SparkSession, dir: String): DataFrame =
    anomalyFrom(events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt")))

  /** The anomaly stage over an already-windowed (hour, event_type, cnt)
    * table — shared by the batch op above and StreamingSpec, which feeds
    * it the hourly counts produced by a real watermarked `readStream`
    * window aggregation. */
  def anomalyFrom(hourly0: DataFrame): DataFrame = {
    // cached: hourly feeds BOTH the probe side and the baseline aggregate —
    // uncached, Spark re-scans and re-shuffles the upstream once per
    // branch. The cache is #types × #hours rows, metadata-sized next to
    // the events it summarizes.
    val hourly = hourly0.cache()
    val baseline = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("sq"))
    val dev = col("cnt") * col("n") - col("s")           // n·(cnt − mean)
    val varN2 = col("n") * col("sq") - col("s") * col("s") // n²·var
    hourly.join(broadcast(baseline), "event_type")
      .filter(dev * dev > lit(4) * varN2 && varN2 > 0)
      .select(col("event_type"), col("hour"), col("cnt"),
        round(dev.cast("double") / sqrt(varN2.cast("double")), 6).as("z"))
      .orderBy("event_type", "hour")
  }

  private val stAnomalySql =
    """WITH hourly AS (
      |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |base AS (
      |  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS s, SUM(cnt * cnt) AS sq
      |  FROM hourly GROUP BY 1)
      |SELECT h.event_type, h.hour, h.cnt,
      |  round(CAST(h.cnt * b.n - b.s AS DOUBLE)
      |    / sqrt(CAST(b.n * b.sq - b.s * b.s AS DOUBLE)), 6) AS z
      |FROM hourly h JOIN base b ON h.event_type = b.event_type
      |WHERE (h.cnt * b.n - b.s) * (h.cnt * b.n - b.s) > 4 * (b.n * b.sq - b.s * b.s)
      |  AND b.n * b.sq - b.s * b.s > 0
      |ORDER BY h.event_type, h.hour""".stripMargin

  // --- st_changelog_apply: apply a keyed changelog to reach the live
  // snapshot — upserts ('view'/'click'/... events) refresh a key, a
  // tombstone ('error' here stands in for the -D RowKind) removes it if it
  // is the key's LATEST entry. The t_changelog/CDC story in streaming
  // form: the batch twin below is one window shuffle; the stateful twin
  // (StreamIngest.applyChangelog, O(1) state per key) is asserted equal by
  // StreamingSpec under out-of-order micro-batches.
  def stChangelogApply(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("event_type"))
      .orderBy("user_id")
  }

  private val stChangelogApplySql =
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
      |FROM (SELECT user_id, event_id, ts, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin

  // --- st_pattern: CEP-lite sequence detection — a purchase "converts"
  // when the same user viewed within the preceding 10 minutes. Batch form:
  // the preceding-view timestamp is a conditional running MAX over one
  // user-keyed window (strictly-preceding frame, so a view at the same
  // instant but later event_id never counts), then a per-user aggregate.
  // Integer-microsecond comparisons keep the match bit-identical across
  // engines. Streaming form: StreamIngest.detectPattern holds one O(1)
  // last-view timestamp per user (flatMapGroupsWithState) — state does not
  // grow with stream length, the CEP-engine property. One shuffle total.
  def stPattern(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("converted",
        when(col("last_view_us").isNotNull &&
          unix_micros(col("ts")) - col("last_view_us") <= 600L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"), sum("converted").as("n_converted"))
      .orderBy("user_id")
  }

  private val stPatternSql =
    """WITH x AS (SELECT user_id, ts, event_type,
      |    max(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_us
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_purchases,
      |  CAST(SUM(CASE WHEN last_view_us IS NOT NULL
      |      AND epoch_us(ts) - last_view_us <= 600 * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_converted
      |FROM x WHERE event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // --- st_temporal_join: event-time temporal-table join — Flink's
  // versioned-dimension join (FOR SYSTEM_TIME AS OF), the semantics a
  // stream-enrichment needs when the dimension is ITSELF a changelog:
  // each purchase joins the signup "plan" version valid AT the purchase's
  // event time (not the latest version — that would leak the future).
  // Batch form: tag signups before purchases at equal ts, one user-keyed
  // window pass carrying the last non-null version forward (one shuffle,
  // no join at all — the dimension rides the same partitioning as the
  // probe). Purchases before any signup report version -1. Streaming
  // form: StreamIngest.temporalJoin holds one O(1) (latest version) state
  // per user; StreamingSpec asserts stream == batch.
  def stTemporalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === "signup",
          get_json_object(col("props"), "$.k").cast("long")).as("k"),
        when(col("event_type") === "signup", 0).otherwise(1).as("tag"))
    val w = Window.partitionBy("user_id").orderBy("ts", "tag", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("plan_k", last("k", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        coalesce(col("plan_k"), lit(-1L)).as("plan_k"))
      .orderBy("event_id")
  }

  // engine-agnostic carry-forward: grp counts non-null versions up to the
  // row, so each (user, grp) slice holds exactly the one signup that opened
  // it — MAX over the slice recovers its k without IGNORE NULLS syntax
  private val stTemporalJoinSql =
    """WITH e AS (SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN event_type = 'signup'
      |         THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
      |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag
      |  FROM events WHERE event_type IN ('signup', 'purchase')),
      |g AS (SELECT *, COUNT(k) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM e),
      |v AS (SELECT *, MAX(k) OVER (PARTITION BY user_id, grp) AS plan0 FROM g)
      |SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      |  COALESCE(plan0, -1) AS plan_k
      |FROM v WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("st_temporal_join", stTemporalJoin, Some(stTemporalJoinSql)),
    QueryDef("st_pattern", stPattern, Some(stPatternSql)),
    QueryDef("st_changelog_apply", stChangelogApply, Some(stChangelogApplySql)),
    QueryDef("st_anomaly", stAnomaly, Some(stAnomalySql)),
    QueryDef("st_window_topk", stWindowTopk, Some(stWindowTopkSql)),
    QueryDef("st_window_agg", stWindowAgg, Some(stWindowAggSql)),
    QueryDef("st_hop_window", stHopWindow, Some(stHopWindowSql)),
    QueryDef("st_sessionize", stSessionize, Some(stSessionizeSql)),
    QueryDef("st_session_window", stSessionWindow, Some(stSessionWindowSql)),
    QueryDef("st_dedup", stDedup, Some(stDedupSql)),
    QueryDef("st_late_drop", stLateDrop, Some(stLateDropSql)),
    QueryDef("st_enrich", stEnrich, Some(stEnrichSql)),
    QueryDef("st_stream_join", stStreamJoin, Some(stStreamJoinSql)))
}
