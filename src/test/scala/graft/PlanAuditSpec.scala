package graft

import graft.operators.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the properties that decide 100 TB behavior —
  * broadcast joins where a side is dimension-sized, filter pushdown and
  * column pruning reaching the parquet scans, map-side partial aggregation,
  * and bounded shuffle counts. */
class PlanAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def executed(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def planString(df: DataFrame): String = executed(df).toString

  /** Hash shuffles only. Excluded from the count: the final presentation
    * ORDER BY's RangePartitioning exchange (unavoidable while emitting
    * deterministically ordered results), and RoundRobinPartitioning — the
    * only round-robin in query paths is GraftSession.spread, the
    * scale-adaptive small-scan parallelizer (fires only when the scan has
    * fewer splits than the session's cores, i.e. never at production
    * scale; it moves only the small table's bytes). Key-hash shuffles are
    * the data movement these pins budget. */
  private def countShuffles(df: DataFrame): Int = {
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case e: ShuffleExchangeExec
            if !e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] &&
              !e.outputPartitioning.isInstanceOf[
                org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => 1
        case a: AdaptiveSparkPlanExec => return walk(a.executedPlan)
        case _ => 0
      }
      self + p.children.map(walk).sum
    }
    walk(executed(df))
  }

  test("q1: filter and column pruning reach the parquet scan") {
    val s = planString(Queries.q1PricingSummary(spark, sfDir))
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), s)
    // only the 7 needed columns of 10 are read
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"), readSchema)
  }

  test("q1: aggregation is partial (map-side combine) before the shuffle") {
    val s = planString(Queries.q1PricingSummary(spark, sfDir))
    assert(s.contains("partial_sum"), s)
  }

  test("q3: dimension side is broadcast, not shuffled") {
    val s = planString(Queries.q3ShippingPriority(spark, sfDir))
    assert(s.contains("BroadcastHashJoin"), s)
    // customer filter pushed down into its scan
    assert(s.contains("EqualTo(c_mktsegment,BUILDING)"), s)
  }

  test("q5: 6-way star join uses broadcasts for all dimension sides") {
    val s = planString(Queries.q5LocalSupplier(spark, sfDir))
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$s")
    // the lineitem scan reads only the 4 needed columns
    val li = s.linesIterator.filter(_.contains("lineitem")).mkString
    assert(li.contains("l_extendedprice") && !li.contains("l_quantity"), li)
  }

  test("q_skew_join: a genuine fact-fact shuffle join (no broadcast of facts)") {
    val df = Queries.qSkewJoin(spark, sfDir)
    df.count() // finalize AQE
    val s = planString(df)
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
      s.contains("BroadcastHashJoin"), s) // AQE may broadcast at tiny SF — any join op present
  }

  test("windowed queries shuffle exactly once (partitioning reused)") {
    assert(countShuffles(Queries.qRunningSum(spark, sfDir)) == 1)
    assert(countShuffles(Queries.qWindowRank(spark, sfDir)) == 1)
  }

  test("q_range_join bands to an equi-join — no cartesian product anywhere") {
    val s = planString(Queries.qRangeJoin(spark, sfDir))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("q_asof_join is a single window pass — one shuffle, no join") {
    val df = Queries.qAsofJoin(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    assert(countShuffles(df) == 1)
  }

  test("q_pivot: two-phase agg, no per-status scans or joins") {
    val df = Queries.qPivot(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    // Spark pivots as agg-to-(group,status)-cells then pivot-agg: the first
    // shuffle moves already-reduced cells, the second only |groups| rows —
    // never a per-status scan of the input
    assert(countShuffles(df) <= 2)
    assert(s.contains("partial_"), s)
  }

  test("d_embed_lsh: banded candidate join, never a cartesian product") {
    val s = planString(graft.dedup.Dedup.dEmbedLsh(spark, sfDir))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("d_embed_lsh: verify step joins candidates to the corpus — no driver collect") {
    val s = planString(graft.dedup.Dedup.dEmbedLsh(spark, sfDir))
    // the native cosine runs IN the plan over two corpus equi-joins; a
    // driver-broadcast verify would show neither the expression nor the
    // second pair of joins
    assert(s.contains("cosine_sim_d"), s)
    assert(s.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) >= 3,
      s"expected band join + two corpus joins in:\n$s")
  }

  test("graft relations hand InternalRows straight through (no V1 row conversion)") {
    val df = spark.range(3).toDF("id")
    // needConversion=false is the contract that removes the per-row
    // InternalRow→Row→InternalRow copy at the relation boundary
    assert(!graft.sources.GraftRelation(spark.sqlContext, df).needConversion)
    assert(!new graft.sources.GraftV1TableScan(spark.sqlContext, df).needConversion)
  }

  test("x_pack / m_pack_shards: prefix sums window by (key, bucket), never key alone") {
    for (df <- Seq(graft.text.TextOps.xPack(spark, sfDir),
        graft.multimodal.Multimodal.mPackShards(spark, sfDir))) {
      val s = planString(df)
      // the bulk window must partition by the doc_id-range bucket too —
      // window partition count then scales with data volume, not with the
      // handful of langs/modalities
      val windows = s.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      assert(windows.nonEmpty, s)
      assert(windows.exists(_.matches(""".*windowspecdefinition\((lang|media_type)#\d+[L]?, bkt#\d+.*""")),
        s"bulk cumsum not bucketed in:\n${windows.mkString("\n")}")
      // the offsets join is a broadcast of the tiny per-bucket totals
      assert(s.contains("BroadcastHashJoin"), s)
    }
  }

  test("q_decile_report / c_token_budget: no single-partition window consumes a fact table") {
    // the bulk rank/cumsum window must partition by the range bucket —
    // NTILE/prefix-sum work then spreads across tasks; the only global
    // windows left are over the tiny per-bucket offset tables
    for ((df, bulkPat) <- Seq(
        Queries.qDecileReport(spark, sfDir) -> """.*windowspecdefinition\(bkt#\d+L?, o_totalprice.*""",
        graft.pipeline.Curation.cTokenBudget(spark, sfDir) ->
          """.*windowspecdefinition\(lang#\d+, band#\d+L?.*""")) {
      val s = planString(df)
      val windows = s.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      assert(windows.nonEmpty, s)
      assert(windows.exists(_.matches(bulkPat)),
        s"bulk window not bucketed in:\n${windows.mkString("\n")}")
      // the per-bucket offsets come back via broadcast, not a shuffle
      assert(s.contains("BroadcastHashJoin"), s)
    }
  }

  test("s_ivf_pq / x_zipf: bucket-restricted scans and salted two-phase ranking") {
    // s_ivf_pq: the probes restriction reaches the ADC side via broadcast
    // (the encoded corpus is never cross-joined to all queries), and the
    // shortlist ranks two-phase
    val sp = planString(graft.ann.Ann.sIvfPq(spark, sfDir))
    assert(sp.linesIterator.count(_.contains("BroadcastHashJoin")) >= 3, sp)
    assert(!sp.contains("CartesianProduct"), sp)
    // x_zipf: the bulk rank window partitions by (lang, salt), not lang
    val sz = planString(graft.text.TextOps.xZipf(spark, sfDir))
    val zw = sz.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(zw.exists(_.matches(""".*windowspecdefinition\(lang#\d+, _w\d+#\d+L?.*""")),
      s"x_zipf bulk window not salted:\n${zw.mkString("\n")}")
  }

  test("s_topk_bruteforce: two-phase ranking — no single-task sort of a query's candidates") {
    val s = planString(graft.ann.Ann.sTopkBruteforce(spark, sfDir))
    val windows = s.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // the bulk window partitions by (q_id, salt) — the salt is projected
    // out as a _w0 attribute — and only the <= 32k survivors pass through
    // the per-query window
    assert(windows.size >= 2 &&
      windows.exists(_.matches(""".*windowspecdefinition\(q_id#\d+L, _w0#\d+.*""")),
      s"salted local ranking missing in:\n${windows.mkString("\n")}")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("d_embed_cosine: block-pair scan broadcasts only the pair table") {
    val df = graft.dedup.Dedup.dEmbedCosine(spark, sfDir)
    val s = planString(df)
    // vectors travel via hash-partitioned equi-joins on the block id; the
    // only broadcast is the (ga, gb) pair table (ints, O(blocks²))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    val bcasts = s.linesIterator.filter(_.contains("BroadcastExchange")).toSeq
    assert(bcasts.nonEmpty, s"pair table should broadcast in:\n$s")
    assert(!s.contains("collect_list"), s) // no whole-corpus aggregation to one row
  }

  test("MOR snapshot read: base rows bypass the resolution window via broadcast anti-join") {
    import graft.tables._
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/mor_plan", "o_orderkey", "o_orderkey", tableType = TableType.Mor))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, sfDir, "orders")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.limit(50).withColumn("o_orderstatus",
      org.apache.spark.sql.functions.lit("Z")))
    val df = tbl.read()
    df.count() // finalize AQE so the small delta-key side becomes a broadcast
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s"expected broadcast anti-join for untouched base rows in:\n$s")
  }

  test("q_grouping_sets: ONE expand+agg pass with map-side partials, no self-unions") {
    val df = Queries.qGroupingSets(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_count") || s.contains("partial_sum"), s)
    // grouping sets expand in-plan — never as a union of per-set scans
    assert(!s.contains("Union"), s)
    assert(s.linesIterator.count(_.contains("Scan parquet")) == 1, s)
  }

  test("d_semdedup: centroid assignment broadcasts; pair scan is bucket-blocked") {
    val s = planString(graft.dedup.Dedup.dSemdedup(spark, sfDir))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"), s)
    // the in-cluster pair join is an equi-join on the bucket, not cartesian
    assert(!s.contains("CartesianProduct"), s)
  }

  test("IVF family: centroid side is a FIXED-k top-k sample, broadcast, never a shuffle") {
    // The centroid sample must compile to TakeOrderedAndProject (one O(n)
    // pass keeping k rows — never a global sort) and be consumed via a
    // broadcast. A centroid rule whose output grows with the corpus
    // (the old vec_id % 100) is the 100 TB killer this pins against:
    // limit(k) guarantees the broadcast is constant-size by construction.
    for (df <- Seq(graft.ann.Ann.sTopkIvf(spark, sfDir),
        graft.dedup.Dedup.dSemdedup(spark, sfDir))) {
      val s = planString(df)
      assert(s.contains("TakeOrderedAndProject"), s)
      assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"), s)
      assert(!s.contains("CartesianProduct"), s)
    }
  }

  test("x_source_overlap: shingle-blocked equi-join, no doc cross product") {
    val s = planString(graft.text.TextOps.xSourceOverlap(spark, sfDir))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("d_incr_dedup: batch-only probe, no cross product — history is never self-paired") {
    val s = planString(graft.dedup.Dedup.dIncrDedup(spark, sfDir))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // the batch restriction (doc_id % 2 = 1) is a real filter below the
    // pair join — the probe stream is batch-sized, not corpus-sized
    assert(s.contains("% 2") && s.contains("= 1"), s)
  }

  test("saltedJoin: identical results to the plain join; salts scatter the key") {
    import org.apache.spark.sql.functions._
    val lineitem = GraftSession.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice")
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderpriority")
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
    val salted = graft.operators.Salting
      .saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey", salts = 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect()
    assert(salted.sameElements(plain))
  }

  test("q_bloom_join: bloom probe runs inside whole-stage codegen on the fact scan") {
    val df = Queries.qBloomJoin(spark, sfDir)
    df.collect() // execute THIS plan so AQE finalizes and codegen markers appear
    val s = planString(df)
    // the bloom_contains filter must sit fused (*) in the codegen stage that
    // reads lineitem — a CodegenFallback here would pay interpreted eval per
    // fact row, exactly the m_audio_windows disease
    assert(s.linesIterator.exists(l =>
      l.contains("bloom_contains") && """\*\(\d+\) Filter""".r.findFirstIn(l).isDefined),
      s"bloom_contains not inside WholeStageCodegen:\n${s.take(4000)}")
    assert(!s.contains("CodegenFallback"), s)
    // and the exact join is still there to remove false positives
    assert(s.contains("Join"), s)
  }

  test("q_pagerank: no cartesian product; iterations build on checkpointed edges") {
    val df = Queries.qPagerank(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // the final plan must read the checkpointed rank RDD, not re-derive the
    // full 5-iteration lineage (localCheckpoint bounds plan depth per round)
    assert(s.contains("Scan ExistingRDD") || s.contains("LogicalRDD"), s)
  }

  test("st_temporal_join: the as-of join is ONE window shuffle, no join operator") {
    val df = graft.streaming.StreamingOps.stTemporalJoin(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s) // the dimension rides the probe's partitioning
    assert(countShuffles(df) == 1, s"expected 1 hash shuffle:\n$s")
  }

  test("d_seen_filter: no cartesian; joins touch only bloom-positive candidates") {
    val df = graft.dedup.Dedup.dSeenFilter(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // the bloom prefilter must survive into the physical plan (candidates
    // reach the semi/anti joins only through it)
    assert(s.contains("bloom_contains"), s)
  }

  test("q6: every filter pushes to the scan; global agg is partial") {
    val s = planString(Queries.q6ForecastRevenue(spark, sfDir))
    // the plan string truncates the filter list — assert the pushdown of all
    // three columns via the IsNotNull prefix plus the first range filter
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " +
      "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda"), s)
    assert(s.contains("partial_sum"), s)
    // only the 4 referenced columns are read
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"), readSchema)
  }

  test("q18: quantity aggregate combines map-side before the join shuffle") {
    val s = planString(Queries.q18LargeOrders(spark, sfDir))
    assert(s.contains("partial_sum"), s)
  }

  test("q10/q14/q19: dimension sides broadcast, never shuffled") {
    Seq(
      Queries.q10ReturnedItems(spark, sfDir),
      Queries.q14PromoShare(spark, sfDir),
      Queries.q19Disjunctive(spark, sfDir)).foreach { df =>
      val s = planString(df)
      assert(s.contains("BroadcastHashJoin"), s)
    }
  }

  test("q19: the disjunctive bands filter, not a post-join residue only") {
    val s = planString(Queries.q19Disjunctive(spark, sfDir))
    // the quantity disjunction prunes lineitem BEFORE the join: quantity
    // bounds appear in the scan-side data filters
    assert(s.contains("l_quantity"), s)
    assert(s.contains("partial_sum"), s)
  }

  test("st_enrich: the static dim is broadcast — no shuffle of the stream side") {
    val df = graft.streaming.StreamingOps.stEnrich(spark, sfDir)
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(countShuffles(df) == 0, s) // only the presentation ORDER BY remains
  }

  test("m_frame_dedup: one hash aggregation on the fingerprint, no pairwise join") {
    val df = graft.multimodal.Multimodal.mFrameDedup(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    assert(s.contains("partial_min") || s.contains("partial_count") || s.contains("HashAggregate"), s)
  }

  test("m_phash_dedup: candidates come from an equi-join on (band, value) — no cartesian scan") {
    val df = graft.multimodal.Multimodal.mPhashDedup(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"), s)
    // the Hamming verify is integer bit_count on the banded candidates,
    // inside codegen (no UDF, no HOF fallback)
    assert(!s.contains("CodegenFallback"), s)
  }

  test("m_pack_shards: bounded shuffles — 2 bulk + 2 bucket-sized") {
    val df = graft.multimodal.Multimodal.mPackShards(spark, sfDir)
    // BULK rows move twice: into the (media_type, bkt) window and into the
    // (media_type, shard_id) manifest agg. The other two shuffles carry
    // only per-bucket totals (rows/1024) for the offset pass.
    assert(countShuffles(df) <= 4, planString(df))
    assert(planString(df).contains("partial_"), "manifest agg must be partial")
  }

  test("st_dedup: dedup is a partial-aggregable hash agg (map-side combine)") {
    val df = graft.streaming.StreamingOps.stDedup(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    assert(countShuffles(df) <= 1, s)
  }

  test("q2: derived supply catalog shuffles once; part/supplier/min-cost all broadcast") {
    val df = Queries.q2MinCostSupplier(spark, sfDir)
    val s = planString(df)
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts in:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
    // the only hash shuffles: the (part, supplier) partial-combined aggregate
    // (lineitem appears once per branch of the min-cost self-reference)
    assert(s.contains("partial_min"), s)
  }

  test("q9: all dims broadcast — lineitem joins orders as the only fact shuffle") {
    val s = planString(Queries.q9ProductProfit(spark, sfDir))
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts in:\n$s")
    // part filter pushes into the part scan, date columns prune
    assert(s.contains("StringContains(p_name,widget)"), s)
    assert(s.contains("partial_sum"), s)
  }

  test("q11: grand total is a 1-row broadcast back over per-part values") {
    val df = Queries.q11ImportantParts(spark, sfDir)
    val s = planString(df)
    // the 1-row total side may plan as BroadcastNestedLoopJoin (no key) —
    // that is the correct shape for a scalar subquery; what must NOT appear
    // is a shuffled cartesian of the values side
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("Broadcast"), s)
    assert(s.contains("partial_sum"), s)
  }

  test("s_knn_graph: bucket-blocked equi pair join; dedupe ships no embeddings") {
    val df = graft.ann.Ann.sKnnGraph(spark, sfDir)
    val s = planString(df)
    // the only nested-loop join allowed is the broadcast centroid
    // cross-join (O(#centroids) rows); the corpus-vs-corpus pair join must
    // be hash-equi on (bucket), never cartesian
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin") ||
      s.contains("ShuffledHashJoin"), s)
    // the pair-dedupe exchange carries only (q_id, vec_id, cos_r) — no
    // array column crosses that shuffle
    val exchanges = s.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!exchanges.contains("qe") && !exchanges.contains("ne"), exchanges)
  }

  test("st_anomaly: two narrow shuffles — hourly counts then a broadcast baseline") {
    val df = graft.streaming.StreamingOps.stAnomaly(spark, sfDir)
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(s.contains("partial_count") || s.contains("partial_sum"), s)
    assert(countShuffles(df) <= 2, s)
  }

  test("m_caption_pairs: one keyed join, no extra shuffle") {
    val df = graft.multimodal.Multimodal.mCaptionPairs(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(countShuffles(df) <= 2, s) // join co-partitioning only
  }

  test("q_gap_fill: grid generates from an aggregate, never a raw-event rescan") {
    val df = Queries.qGapFill(spark, sfDir)
    val s = planString(df)
    // the hourly cache feeds both branches: at most the hourly agg
    // shuffle + the fill-join exchange appear above InMemoryTableScans
    assert(s.contains("InMemoryTableScan"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q_heavy_hitters: sketch probe side broadcasts; build is partial-combined") {
    val s = planString(Queries.qHeavyHitters(spark, sfDir))
    assert(s.contains("BroadcastHashJoin"), s)
    assert(s.contains("partial_count"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("x_tfidf: tf/df shuffles carry aggregates; doc count broadcasts") {
    val df = graft.text.TextOps.xTfidf(spark, sfDir)
    val s = planString(df)
    assert(s.contains("InMemoryTableScan"), s) // tf cached for both consumers
    assert(s.contains("Broadcast"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q20: no fact-fact shuffle — per-supplier aggregate combines map-side") {
    val df = Queries.q20ExcessShipments(spark, sfDir)
    val s = planString(df)
    val broadcasts = s.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 2, s"expected >=2 broadcast joins, got $broadcasts in:\n$s")
    assert(s.contains("partial_sum"), s)
    // ship-date window pushes to the lineitem scan
    assert(s.contains("PushedFilters") && s.contains("l_shipdate"), s)
    // one hash shuffle total: the per-supplier aggregate
    assert(countShuffles(df) <= 1, s)
  }

  test("q_cube: one Expand + partial-combined aggregate, no join") {
    val df = Queries.qCube(spark, sfDir)
    val s = planString(df)
    assert(s.contains("Expand"), s) // the cube's grouping-set expansion
    assert(s.contains("partial_"), s)
    assert(!s.contains("Join"), s)
    // the expansion feeds ONE hash aggregate: one data shuffle total
    assert(countShuffles(df) <= 1, s)
  }

  test("q_latest_per_key: single window shuffle, never a max-self-join") {
    val df = Queries.qLatestPerKey(spark, sfDir)
    val s = planString(df)
    assert(s.contains("Window") || s.contains("WindowGroupLimit"), s)
    assert(!s.contains("Join"), s)
    assert(countShuffles(df) <= 1, s)
    // rn = 1 prunes inside the window operator (group-limit pushdown),
    // so each task keeps one row per key instead of sorting whole groups
    assert(s.contains("WindowGroupLimit"), s)
  }

  test("x_ngram_stats: bigram distinct happens in-array; agg is partial-combined") {
    val df = graft.text.TextOps.xNgramStats(spark, sfDir)
    val s = planString(df)
    assert(s.contains("array_distinct"), s) // per-doc dedup BEFORE the explode
    assert(s.contains("partial_count"), s)
    assert(!s.contains("Join"), s)
  }

  test("q_percent_rank: spend aggregate combines map-side before the rank window") {
    val df = Queries.qPercentRank(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_"), s)
    assert(!s.contains("Join"), s)
  }

  test("q_moving_avg: partial daily agg, frame window, no join, bounded shuffles") {
    val df = Queries.qMovingAvg(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_sum"), s)
    // RANGE frame over epoch-day ints: true 7-CALENDAR-day window on gaps
    assert(s.contains("RangeFrame, -6, currentrow"), s)
    assert(!s.contains("Join"), s)
    // daily aggregate (day, type) + window re-key on type — nothing more
    assert(countShuffles(df) <= 2, s)
  }

  test("q_lead_lag: aggregate-then-window, no join, bounded shuffles") {
    val df = Queries.qLeadLag(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_count"), s)
    assert(!s.contains("Join"), s)
    assert(countShuffles(df) <= 2, s)
  }

  test("q_set_ops: intersect/except lower to key-only hash joins, no cartesian") {
    val s = planString(Queries.qSetOps(spark, sfDir))
    assert(!s.contains("CartesianProduct"), s)
    // set ops must move only the key column, never order payloads
    val shuffleLines = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffleLines.forall(l => !l.contains("o_orderdate")), shuffleLines.mkString("\n"))
  }

  test("d_cross_source: blocked pair mining only — no cartesian, no payload in drops") {
    val s = planString(graft.dedup.Dedup.dCrossSource(spark, sfDir))
    assert(!s.contains("CartesianProduct"), s)
    // the drop set carries doc ids only; text never reaches the retention join
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("text")), exchanges.mkString("\n"))
  }

  test("s_recall_eval: both index paths keep the fixed-size centroid sample; no cartesian") {
    val s = planString(graft.ann.Ann.sRecallEval(spark, sfDir))
    assert(!s.contains("CartesianProduct"), s)
    // the IVF side's centroid sample stays a bounded top-k pass
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("q_correlated: scalar subqueries decorrelate to one aggregate join — no per-row re-execution") {
    val df = Queries.qCorrelated(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    // decorrelated: the per-customer aggregate combines map-side and joins back
    assert(s.contains("partial_sum") || s.contains("partial_count"), s)
    assert(s.contains("Join"), s)
  }

  test("q_string_agg: distinct-first bounded payload; nation side broadcast") {
    val df = Queries.qStringAgg(spark, sfDir)
    val s = planString(df)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("CartesianProduct"), s)
    // the distinct reduces (nation, segment) pairs BEFORE the collect_set agg:
    // no exchange may carry customer payload columns
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("c_name") && !l.contains("c_acctbal")),
      exchanges.mkString("\n"))
  }

  test("q_sessions: one user-keyed exchange feeds every window; no join") {
    val df = Queries.qSessions(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    // lag + running-sum windows share the user_id partitioning; the
    // (user, sess) and user aggregates reuse it — one hash exchange total
    assert(countShuffles(df) <= 1, s)
  }

  test("q_active_intervals: day-level partial agg before the bounded global window") {
    val df = Queries.qActiveIntervals(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_sum"), s) // per-day net combines map-side
    assert(!s.contains("Join"), s)
    assert(s.contains("TakeOrderedAndProject"), s) // top-10, never a full sort
  }

  test("x_char_classes / x_readability: pure per-row codegen, no shuffle before ordering") {
    for (df <- Seq(graft.text.TextOps.xCharClasses(spark, sfDir),
        graft.text.TextOps.xReadability(spark, sfDir))) {
      val s = planString(df)
      assert(!s.contains("Join"), s)
      assert(countShuffles(df) <= 1, s) // only the final orderBy range exchange
    }
  }

  test("s_filtered_knn: pre-filter is a key-only broadcast semi join; queries broadcast") {
    val df = graft.ann.Ann.sFilteredKnn(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    // doc-id filter joins as LeftSemi and never drags document payload
    assert(s.contains("LeftSemi"), s)
    assert(!s.contains("text"), s)
  }

  test("s_score_dist: broadcast queries, map-side-combinable histogram agg") {
    val df = graft.ann.Ann.sScoreDist(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_count"), s)
    // only the broadcast query set joins the corpus; no corpus shuffle pre-agg
    assert(s.contains("BroadcastNestedLoopJoin"), s)
    assert(countShuffles(df) <= 2, s)
  }

  test("x_stopword_profile: isin prune precedes the shuffle; bounded agg") {
    val df = graft.text.TextOps.xStopwordProfile(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    assert(s.contains("partial_count"), s)
  }

  test("q_rolling_distinct: pairs reduced before the band join; month dim broadcast") {
    val df = Queries.qRollingDistinct(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("BroadcastNestedLoopJoin"), s) // tiny month dim, band predicate
    // the per-row shuffle is the pair distinct — keys only, no order payload
    val exchanges = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("o_totalprice")), exchanges.mkString("\n"))
  }

  test("c_dedup_mixture: one fingerprint window shuffle; totals broadcast") {
    val df = graft.pipeline.Curation.cDedupMixture(spark, sfDir)
    val s = planString(df)
    assert(s.contains("BroadcastNestedLoopJoin"), s) // 1-row totals
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q_first_last: one hash agg with map-side partials — no window, no sort before the agg") {
    val df = Queries.qFirstLast(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Window"), s) // min_by/max_by, not first_value frames
    assert(s.contains("partial_min_by") || s.contains("partial_"), s)
    assert(countShuffles(df) <= 2, s) // agg re-key + presentation sort only
  }

  test("q_bucketed_join: the fact-fact join consumes bucket co-partitioning — zero exchange on the keys") {
    // audit the lazy join plan (qBucketedJoin itself materializes + drops
    // its tables, returning a local result), then clean up the tables here
    val s = planString(Queries.qBucketedJoinPlan(spark, sfDir))
    try {
      assert(s.contains("SortMergeJoin"), s)
      assert(s.contains("Bucketed: true"), s) // both scans read their buckets
      assert(!s.contains("BroadcastExchange"), s)
      // the join keys are never re-shuffled: the only exchanges allowed are
      // the aggregate/presentation ones on o_orderpriority above the join
      val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
      assert(exchanges.forall(l => !l.contains("o_orderkey") && !l.contains("l_orderkey")),
        exchanges.mkString("\n"))
    } finally Queries.dropBucketTables(spark, sfDir)
  }

  test("q_copurchase: order-keyed pair blocks, distinct-first, top-k without full sort") {
    val df = Queries.qCopurchase(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.contains("partial_count"), s) // pair counts combine map-side
  }

  test("x_boilerplate: in-array distinct before explode; df agg combines map-side") {
    val df = graft.text.TextOps.xBoilerplate(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("Join"), s)
    assert(s.contains("array_distinct"), s)
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("q_dispersion: exact decimal moments combine map-side; no window") {
    val df = Queries.qDispersion(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_sum"), s)
    assert(!s.contains("Window"), s)
    assert(countShuffles(df) <= 2, s)
  }

  test("x_vocab_growth: window input is the bucket dim, never tokens") {
    val df = graft.text.TextOps.xVocabGrowth(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_min"), s) // first-seen agg combines map-side
    // the (single-partition) running-sum window must sit ABOVE the bucket
    // aggregate — its exchange carries (bucket, new_types) only
    val exchanges = s.linesIterator.filter(_.contains("Exchange SinglePartition")).toSeq
    assert(exchanges.forall(l => !l.contains("tok")), exchanges.mkString("\n"))
  }

  test("q_window_funnel: aggregate-sized step joins, no raw-event self-join, no cartesian") {
    val df = Queries.qWindowFunnel(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("partial_min"), s) // per-user step minima combine map-side
    // no exchange may carry raw event payload (event_type strings move
    // only before their filter+agg, never through the step joins)
    val exchanges = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("props")), exchanges.mkString("\n"))
  }

  test("x_ngram_novelty: 8-byte shingle keys only; first-appearance agg combines map-side") {
    val df = graft.text.TextOps.xNgramNovelty(spark, sfDir)
    val s = planString(df)
    assert(s.contains("partial_min"), s)
    assert(!s.contains("CartesianProduct"), s)
    // shuffles carry (sh: long, doc_id) — never text
    val exchanges = s.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(l => !l.contains("text")), exchanges.mkString("\n"))
    df.sparkSession.catalog.clearCache()
  }

  test("c_curriculum_plan / c_dedup_mixture: O(sources) plans, no raw-doc payload in late exchanges") {
    for (df <- Seq(graft.pipeline.Curation.cCurriculumPlan(spark, sfDir),
        graft.pipeline.Curation.cDedupMixture(spark, sfDir))) {
      val s = planString(df)
      assert(!s.contains("CartesianProduct"), s)
      assert(s.contains("partial_sum"), s) // per-source sums combine map-side
    }
  }

  test("s_outliers: broadcast centroid pass + bounded global top-k, no corpus shuffle join") {
    val df = graft.ann.Ann.sOutliers(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("TakeOrderedAndProject"), s) // top-20, never a full sort
    assert(s.contains("BroadcastNestedLoopJoin"), s) // fixed-k centroids broadcast
  }

  test("d_lsh_tuning: one signature build feeds every config; candidate joins carry no text") {
    val df = graft.dedup.Dedup.dLshTuning(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    // the cached signature table is reused across configs (InMemoryTableScan)
    assert(s.contains("InMemoryTableScan"), s)
    val exchanges = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.forall(l => !l.contains("text")), exchanges.mkString("\n"))
    df.sparkSession.catalog.clearCache()
  }

  test("d_minhash_est: signature build is min-aggs over the cached capped shingles; no text in the estimate join") {
    val df = graft.dedup.Dedup.dMinhashEst(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    assert(s.contains("partial_min"), s) // 16 map-side-combinable min-aggs
    // the estimate join moves signatures only — never shingle strings
    val exchanges = s.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    val sigJoins = exchanges.filter(l => l.contains("a_mh0") || l.contains("b_mh0"))
    assert(sigJoins.forall(l => !l.contains("sh#")), sigJoins.mkString("\n"))
    df.sparkSession.catalog.clearCache()
  }

  test("x_quality_sweep: per-doc metrics cached once; dims broadcast, no driver collect") {
    val df = graft.text.TextOps.xQualitySweep(spark, sfDir)
    val s = planString(df)
    // threshold dim and 1-row total join as broadcasts, not shuffles
    assert(s.contains("BroadcastNestedLoopJoin"), s)
    assert(s.contains("InMemoryTableScan"), s)
    df.sparkSession.catalog.clearCache()
  }

  test("d_substring: the O(chars) probe shuffle carries hashes only — no text, no shingles") {
    val df = graft.dedup.Dedup.dSubstring(spark, sfDir)
    val s = planString(df)
    assert(!s.contains("CartesianProduct"), s)
    // every hash-partitioned exchange in the candidate join moves 8-byte
    // columns (xxhash64 h + ids + the int offset) — a `tn` or a 40-char
    // shingle string in any exchange means the stringless-grid contract
    // broke and the dominant shuffle is paying 5x its bytes
    val exchanges = s.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s)
    assert(exchanges.forall(l => !l.contains("tn#") && !l.contains("sh#")),
      exchanges.mkString("\n"))
    df.sparkSession.catalog.clearCache()
  }
}
