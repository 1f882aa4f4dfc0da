package graft.tables

import graft.{GraftSession, QueryDef, QueryRegistry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** SURVEY.md §2.A — the lakehouse table-management operators, each exercised
  * end-to-end on a scratch GraftTable built deterministically from the
  * testdata and checked against a pure-SQL DuckDB oracle stating the same
  * semantics (quickstart.sql's INSERT/UPDATE/MERGE/DELETE/time-travel/
  * incremental/CDC flow, TestAutomationUtils' upsert+precombine contract,
  * and the table services from the flink configs).
  */
object TableOps extends QueryRegistry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  private def scratch(name: String, sfDir: String): String =
    s"/tmp/graft_tables/${name}_" + sfDir.replaceAll("[^A-Za-z0-9]", "_")

  private def ordersTable(s: SparkSession, dir: String, name: String,
      keyGen: KeyGen = NoPartition, numBuckets: Int = 0,
      changelog: Boolean = false): (GraftTable, DataFrame) = {
    val tbl = GraftTable(s, GraftTableConfig(
      scratch(name, dir), "o_orderkey", "o_orderkey",
      keyGen = keyGen, numBuckets = numBuckets, writeChangelog = changelog))
    tbl.dropIfExists()
    (tbl, t(s, dir, "orders"))
  }

  private val ordersCols =
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"

  /** The deterministic upsert batch used by several ops: keys % 10 == 0 get
    * status 'U' and +100 price. */
  private def upsertBatch(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100)
      .withColumn("o_orderstatus", lit("U"))

  private val upsertedSql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders""".stripMargin

  // --- t_insert: bulk insert → snapshot read.
  def tInsert(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_insert")
    tbl.insert(orders, numFiles = 4)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_upsert: keyed upsert, incoming wins; only colliding files rewritten.
  def tUpsert(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_upsert")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_delete: DELETE by predicate.
  def tDelete(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_delete")
    tbl.insert(orders, numFiles = 4)
    tbl.delete(col("o_orderstatus") === "F")
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_merge: MERGE INTO, UPDATE SET * / INSERT * (quickstart.sql:59-66).
  def tMerge(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_merge")
    tbl.insert(orders, numFiles = 4)
    val matched = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 50)
      .withColumn("o_orderstatus", lit("M"))
    val fresh = orders.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    tbl.merge(matched.unionByName(fresh))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_partial_update: sparse-patch upsert (Hudi's
  // OverwriteNonDefaultsWithLatestAvroPayload) — NULL source fields keep the
  // stored value, so a producer can ship only the columns that changed.
  def tPartialUpdate(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_partial_update")
    tbl.insert(orders, numFiles = 4)
    // the patch carries ONLY key + new price; everything else is null
    val patch = orders.filter(col("o_orderkey") % 10 === 0).select(
      col("o_orderkey"),
      lit(null).cast("bigint").as("o_custkey"),
      lit(null).cast("string").as("o_orderstatus"),
      (col("o_totalprice") + 100).as("o_totalprice"),
      lit(null).cast("timestamp").as("o_orderdate"),
      lit(null).cast("string").as("o_orderpriority"))
    tbl.partialUpsert(patch)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_precombine_dedup: precombine keeps the highest `ver` per key.
  def tPrecombineDedup(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_precombine_dedup", dir), "o_orderkey", "ver"))
    tbl.dropIfExists()
    val v1 = orders.withColumn("ver", lit(1))
    val v2 = orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1)
      .withColumn("ver", lit(2))
    tbl.insert(v1.unionByName(v2), numFiles = 4)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_clean: KEEP_LATEST_COMMITS cleaner — after two mutations, retain
  // only the latest snapshot's commits; replaced files are physically
  // deleted and the current snapshot still reads exactly right.
  def tClean(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_clean")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.cleanRetainCommits(1)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_time_travel: snapshot AS OF the first commit.
  def tTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_time_travel")
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.readAsOf(i1).orderBy("o_orderkey")
  }

  // --- t_incremental: latest state of records changed in (i1, i2].
  def tIncremental(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_incremental")
    val i1 = tbl.insert(orders, numFiles = 4)
    val i2 = tbl.upsert(upsertBatch(orders))
    tbl.incremental(i1, i2).orderBy("o_orderkey")
  }

  // --- t_cdc: changelog read across an upsert and a delete commit.
  // --- t_cdc_view: INCREMENTAL MATERIALIZED-VIEW MAINTENANCE from CDC
  // images — the thing CDC exists for. A per-priority revenue aggregate is
  // maintained purely from the change stream (+insert/+postimage,
  // -preimage/-delete), never recomputed from table state; the oracle IS
  // the recompute over the final state, so the telescoping-delta identity
  // is verified exactly (decimal-cast per image → order-free exact sums).
  // At 100 TB the view maintenance cost is O(changes), not O(table).
  def tCdcView(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_cdc_view", changelog = true)
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.delete(col("o_orderstatus") === "F")
    val images = tbl.cdc(Timeline.pad(0), Timeline.MaxInstant)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1)
      .otherwise(-1)
    images
      .withColumn("p_d", sign * col("o_totalprice").cast(DecimalType(18, 2)))
      .withColumn("c_d", sign.cast("long"))
      .groupBy("o_orderpriority")
      .agg(sum("p_d").cast("double").as("total_price"), sum("c_d").as("n_orders"))
      .filter(col("n_orders") > 0) // a fully-deleted group has no recompute row
      .orderBy("o_orderpriority")
  }

  def tCdc(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_cdc", changelog = true)
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    val i3 = tbl.delete(col("o_orderstatus") === "F")
    tbl.cdc(i1, i3).orderBy("_change_type", "o_orderkey")
  }

  // --- t_compaction: 3 fragmented inserts bin-packed into few files.
  def tCompaction(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_compaction")
    (0 to 2).foreach { m =>
      tbl.insert(orders.filter(col("o_orderkey") % 3 === m), numFiles = 8)
    }
    tbl.compact(targetRows = 10000000L)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_clustering: range-cluster by customer; content unchanged.
  def tClustering(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_clustering")
    tbl.insert(orders, numFiles = 8)
    tbl.cluster(Seq("o_custkey"), numFiles = 8)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_bucket_index: hash-bucketed layout; point lookup reads only
  // bucket+range-pruned files (asserted in TablesSpec).
  def tBucketIndex(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_bucket_index", numBuckets = 8)
    tbl.insert(orders, numFiles = 2)
    tbl.pointLookup(Seq(1L, 7L, 42L, 100L, 999L)).orderBy("o_orderkey")
  }

  // --- t_bloom_index: Hudi's DEFAULT index type (hoodie.index.type=BLOOM)
  // — per-file bloom filters on the record key prune equality lookups past
  // what range stats can. The writes interleave keys modulo 4, so EVERY
  // file spans the whole key range and range pruning keeps all of them;
  // only the parquet footer bloom (written at insert time, probed by
  // lookupFiles with no false negatives) discriminates — TablesSpec pins
  // that the lookup touches fewer files than live. At 100 TB this is the
  // O(candidate-footers) pruning level between free range stats and the
  // paid-for record index.
  def tBloomIndex(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_bloom_index")
    (0 to 3).foreach { m =>
      tbl.insert(orders.filter(col("o_orderkey") % 4 === m), numFiles = 2)
    }
    tbl.pointLookup(Seq(2L, 8L, 44L, 104L, 996L)).orderBy("o_orderkey")
  }

  // --- t_record_index: Hudi-1.0-style record-level index — per-commit
  // (key → file) mappings in hash-bucketed index parquet; a point lookup
  // reads ONE index bucket for the exact file list instead of probing
  // candidate footers. Exercised across an insert + an upsert rewrite so
  // stale mappings (to replaced files) must be liveness-filtered out.
  def tRecordIndex(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_record_index", dir), "o_orderkey", "o_orderkey",
      recordIndexBuckets = 16))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.pointLookup(Seq(1L, 7L, 42L, 100L, 999L)).orderBy("o_orderkey")
  }

  // --- t_archive_timeline: timeline ARCHIVAL (Hudi's archived timeline) —
  // a long-lived table's hot `_graft/` dir would otherwise grow one commit
  // file per write forever, making every liveFiles() replay O(lifetime).
  // A checkpoint snapshots the live-file set at an instant; archive() then
  // moves every commit at or before it into `_graft/archive/`, so the hot
  // timeline stays O(recent commits) at any table age while history reads
  // (incremental, CDC, clean) still resolve archived commits through the
  // fallback. The op checkpoints mid-history, archives, and proves the
  // snapshot read is byte-identical across the checkpoint + hot-tail path.
  def tArchiveTimeline(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_archive_timeline")
    tbl.insert(orders, numFiles = 2)
    (1 to 4).foreach { i =>
      tbl.upsert(orders.filter(col("o_orderkey") % 11 === i)
        .withColumn("o_orderstatus", lit(s"A$i")))
    }
    val instants = tbl.timeline.instants()
    tbl.timeline.checkpoint(instants(2)) // after the insert + 2 waves
    require(tbl.timeline.archive() > 0, "nothing archived")
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_nbcc_upsert: NON-BLOCKING concurrency control (Hudi 1.0 NBCC) —
  // two writers upsert OVERLAPPING keys at the same time with no retry
  // loop at all: MOR upserts append delta files (no removes), so
  // first-committer-wins conflict detection can never fire and neither
  // writer ever waits on or aborts for the other. Resolution across
  // commits is commit-time ordering (Hudi's COMMIT_TIME_ORDERING default)
  // — arrival order of CONCURRENT commits is inherently racy, so the
  // writers stamp contested keys with the SAME image (the idempotent-
  // producer pattern NBCC pipelines use): the snapshot is bit-identical
  // whichever commit lands last. Contrast t_concurrent_upsert, the OCC
  // path, where COW writers race on file rewrites and losers must retry.
  def tNbccUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val path = scratch("t_nbcc_upsert", dir)
    val tbl = GraftTable(s, GraftTableConfig(
      path, "o_orderkey", "o_totalprice", tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = Seq(
      orders.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", when(col("o_orderkey") % 6 === 0,
          col("o_totalprice") + 200).otherwise(col("o_totalprice") + 100))
        .withColumn("o_orderstatus", when(col("o_orderkey") % 6 === 0,
          lit("NB")).otherwise(lit("NA"))),
      orders.filter(col("o_orderkey") % 6 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 200)
        .withColumn("o_orderstatus", lit("NB")))
      .map { b =>
        Future {
          // independent handle per writer. No CONFLICT retry — NBCC means
          // the append path cannot lose a commit race — but the commit
          // lease itself can time out on a loaded host while the peer
          // holds it; that transient (rolled back by withReservedInstant)
          // retries like any lease wait.
          val writer = GraftTable(s, GraftTableConfig(
            path, "o_orderkey", "o_totalprice", tableType = TableType.Mor))
          var attempts = 0
          var done = false
          while (!done) {
            try { writer.upsert(b); done = true }
            catch {
              case _: graft.tables.LockTimeoutException if attempts < 30 =>
                attempts += 1
                Thread.sleep(150L * attempts)
            }
          }
        }
      }
    Await.result(Future.sequence(writers), 600.seconds)
    tbl.read().orderBy("o_orderkey")
  }

  private val tNbccUpsertSql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 6 = 0 THEN 'NB'
      |       WHEN o_orderkey % 3 = 0 THEN 'NA'
      |       ELSE o_orderstatus END AS o_orderstatus,
      |  CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice + 200
      |       WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100
      |       ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- t_rli_compact: record-index COMPACTION — the index-maintenance
  // service behind t_record_index. Every commit appends its own (key →
  // file) index dir, so a long-running table's point lookup degrades to
  // O(#commits) small index reads; compaction folds per-commit dirs into
  // one merged, liveness-filtered index (the same small-file disease and
  // cure as data compaction, applied to the index). The op exercises BOTH
  // tiers: a full fold of the bulk-insert commit establishes the merged
  // base, then two upsert waves land and the second compaction runs
  // INCREMENTALLY — it reads and shuffles only the two new commit dirs
  // and adopts the base by rename (O(#buckets) metadata ops, no data
  // movement), which is what keeps compaction O(new commits) instead of
  // O(live key set) on a years-lived table. Lookups must stay exact
  // across the replaced-file mappings the fold drops.
  def tRliCompact(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_rli_compact", dir), "o_orderkey", "o_orderkey",
      recordIndexBuckets = 16))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    require(tbl.compactRecordIndex(full = true) > 0, "no base fold")
    (1 to 2).foreach { i =>
      tbl.upsert(orders.filter(col("o_orderkey") % 9 === i)
        .withColumn("o_orderstatus", lit(s"W$i")))
    }
    require(tbl.compactRecordIndex() == 3, "expected base + 2 new commits")
    tbl.pointLookup(Seq(1L, 7L, 11L, 12L, 100L, 999L)).orderBy("o_orderkey")
  }

  // --- t_secondary_index: Hudi-1.0-style secondary index — per-commit
  // (value → file) mappings for a non-key column; an equality lookup reads
  // the small index, then scans only the mapped files. Clustering first
  // localizes each priority into few files so the index actually prunes
  // (exercising liveness filtering of the insert commit's stale mappings).
  def tSecondaryIndex(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_secondary_index", dir), "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).orderBy("o_orderkey")
  }

  // --- t_si_compact: secondary-index COMPACTION — t_rli_compact's exact
  // analogue for the value index. Per-commit (value → file) dirs degrade
  // an equality lookup to O(#commits) index reads; the fold merges them
  // liveness-filtered, and the merged dir's _covered manifest preserves
  // the which-commits-are-mapped conservatism test. Exercises BOTH tiers:
  // a full fold of insert+cluster establishes the merged base, an upsert
  // wave lands, and the second compaction runs INCREMENTALLY (reads only
  // the new commit dir, adopts the base by rename). The lookup must stay
  // exact across the stale mappings the fold drops and the re-priced rows
  // the upsert re-priorities.
  def tSiCompact(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_si_compact", dir), "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    require(tbl.compactSecondaryIndex("o_orderpriority", full = true) == 2,
      "no base fold")
    tbl.upsert(orders.filter(col("o_orderkey") % 37 === 0)
      .withColumn("o_orderpriority", lit("1-URGENT")))
    require(tbl.compactSecondaryIndex("o_orderpriority") == 2,
      "expected base + 1 new commit")
    tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).orderBy("o_orderkey")
  }

  // --- t_si_rebuild: secondary-index REBUILD from the live data (Hudi's
  // index backfill re-expressed) — the coverage-HEAL path. A pre-manifest
  // legacy merged dir claims no coverage, so every equality lookup scans
  // conservatively forever (incremental folds can only union existing
  // claims forward, and an SI refold cannot prove per-value completeness
  // the way the RLI's row counts can); the rebuild re-derives distinct
  // (value → file) mappings from ONE two-column O(live data) scan and
  // claims every instant with live files exactly. The lookup must prune
  // again and still match a full scan.
  def tSiRebuild(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_si_rebuild", dir), "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    require(tbl.compactSecondaryIndex("o_orderpriority") == 2, "no fold")
    // simulate the pre-coverage-manifest legacy state
    val root = new org.apache.hadoop.fs.Path(
      s"${tbl.cfg.path}/_graft/si/o_orderpriority")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val merged = fs.listStatus(root).filter(_.isDirectory).head.getPath
    fs.delete(new org.apache.hadoop.fs.Path(merged, "_covered"), false)
    val live = tbl.timeline.liveFiles(None).size
    val before = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    require(before.size == live, "legacy merged dir must scan conservatively")
    require(tbl.rebuildSecondaryIndex("o_orderpriority") == 1,
      "rebuild must consume the legacy dir")
    val after = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    require(after.nonEmpty && after.size < live, "rebuild must restore pruning")
    tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).orderBy("o_orderkey")
  }

  // --- t_consistent_hash: consistent-hashing bucket resize (flink/sql/
  // consistent_hashing.sql) — a 4-bucket table doubles to 8 via PER-BUCKET
  // incremental splits (each hot bucket rewrites locally; lookups stay
  // correct through the mixed-modulus state), then the finalized config
  // flips and point lookups prune under the new modulus.
  def tConsistentHash(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_consistent_hash", numBuckets = 4)
    tbl.insert(orders, numFiles = 1)
    tbl.upsert(upsertBatch(orders))
    tbl.splitBucket(0)
    tbl.splitBucket(1) // mixed-modulus: buckets 0/1 split, 2/3 not
    tbl.splitBucket(2)
    tbl.splitBucket(3)
    require(tbl.finalizeBucketSplit())
    // a FRESH handle sees the persisted bucket count, as any new job would
    val fresh = GraftTable(s, TableProperties.load(s, tbl.cfg.path).get)
    fresh.pointLookup(Seq(1L, 7L, 42L, 100L, 999L, 1000L)).orderBy("o_orderkey")
  }

  // --- t_schema_widen: type-widening evolution — the table starts with an
  // INT column; a later batch writes it as LONG (with values beyond int
  // range). The accumulated schema takes the widest type and older INT32
  // files read as LONG through the explicit-schema scan (no rewrite, no
  // inference job).
  def tSchemaWiden(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_schema_widen")
    tbl.insert(orders.withColumn("o_custkey", col("o_custkey").cast("int")), numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_custkey", col("o_custkey") + 10000000000L))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_partition_prune: hive-style partition dirs; filter prunes partitions.
  def tPartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) =
      ordersTable(s, dir, "t_partition_prune", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    // partition pruning from timeline metadata + the residual filter
    tbl.readWhere(_ == "o_orderpriority=1-URGENT")
      .filter(col("o_orderpriority") === "1-URGENT").orderBy("o_orderkey")
  }

  // --- t_metadata_files: the queryable FILES metadata view (the
  // reference's hudi_metadata() files partition / metadata-table listing):
  // per-partition row counts and key bounds aggregated from TIMELINE
  // metadata only — no data file is opened, which is the whole point of a
  // metadata table at 100 TB (listing + stats without S3 scans). The
  // oracle corroborates the metadata against the data itself: per-file
  // footer stats must roll up to the true per-partition counts/bounds.
  def tMetadataFiles(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_metadata_files",
      keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 4)
    tbl.filesMeta()
      .groupBy(regexp_replace(col("partition"), "^o_orderpriority=", "")
        .as("o_orderpriority"))
      .agg(sum("n_rows").as("n_rows"),
        min(col("min_key").cast("long")).as("min_key"),
        max(col("max_key").cast("long")).as("max_key"))
      .orderBy("o_orderpriority")
  }

  // --- t_incr_join_view: incremental maintenance of a JOIN materialized
  // view from TWO tables' CDC streams — the hard half of incremental ETL
  // (t_cdc_view maintains a single-table aggregate; real pipelines join).
  // With signed change images (insert/update_post = +1, update_pre/delete
  // = -1) the multiset identity is bilinear:
  //   A₁⋈B₁ − A₀⋈B₀ = ΔA⋈B₀ + A₀⋈ΔB + ΔA⋈ΔB
  // so the view is maintained by three delta joins whose inputs are
  // O(changes) on at least one side — never a recompute of A⋈B. The
  // oracle IS the full recompute over the final states, verifying the
  // algebra exactly (decimal-cast per image → order-free exact sums).
  def tIncrJoinView(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val ta = GraftTable(s, GraftTableConfig(
      scratch("t_incr_join_view_a", dir), "o_orderkey", "o_orderkey",
      writeChangelog = true))
    val tb = GraftTable(s, GraftTableConfig(
      scratch("t_incr_join_view_b", dir), "c_custkey", "c_custkey",
      writeChangelog = true))
    ta.dropIfExists(); tb.dropIfExists()
    val ia = ta.insert(orders, numFiles = 4)
    val ib = tb.insert(customer, numFiles = 2)
    // concurrent-ish mutations on BOTH sides: reprice + delete on the fact,
    // re-nation a seventh of the customers on the dim
    ta.upsert(upsertBatch(orders))
    ta.delete(col("o_orderstatus") === "F")
    tb.upsert(customer.filter(col("c_custkey") % 7 === 0)
      .withColumn("c_nationkey", col("c_nationkey") + 100))
    val aOld = ta.readAsOf(ia).select(col("o_custkey"), col("o_totalprice"))
      .withColumn("sa", lit(1))
    val bOld = tb.readAsOf(ib).select(col("c_custkey"), col("c_nationkey"))
      .withColumn("sb", lit(1))
    val sgnImage =
      when(col("_change_type").isin("insert", "update_postimage"), 1).otherwise(-1)
    val dA = ta.cdc(ia, Timeline.MaxInstant)
      .select(col("o_custkey"), col("o_totalprice"), sgnImage.as("sa"))
    val dB = tb.cdc(ib, Timeline.MaxInstant)
      .select(col("c_custkey"), col("c_nationkey"), sgnImage.as("sb"))
    def term(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), (col("sa") * col("sb")).as("sgn"),
          col("o_totalprice"))
    // V₀ + the three delta terms, one union + one grouped signed sum
    term(aOld, bOld).unionByName(term(dA, bOld))
      .unionByName(term(aOld, dB)).unionByName(term(dA, dB))
      .groupBy("c_nationkey")
      .agg(sum(col("sgn").cast("long")).as("n_orders"),
        sum(col("sgn") * col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total_price"))
      .filter(col("n_orders") > 0)
      .orderBy("c_nationkey")
  }

  private val tIncrJoinViewSql =
    """WITH a1 AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS st,
      |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS price
      |  FROM orders),
      |a2 AS (SELECT * FROM a1 WHERE st <> 'F'),
      |b1 AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 7 = 0 THEN c_nationkey + 100 ELSE c_nationkey END AS c_nationkey
      |  FROM customer)
      |SELECT c_nationkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM a2 JOIN b1 ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // --- t_sql_pipeline: the reference's PRIMARY interface end-to-end —
  // the spark-sql quickstart flow (reference spark/sql/quickstart.sql:
  // CREATE/CTAS, UPDATE by predicate, DELETE by predicate, MERGE INTO
  // with not-matched INSERT, final SELECT) driven ENTIRELY through
  // `spark.sql` against the graft DSv2 catalog — no Scala table API in
  // sight. The catalog is registered at runtime on the session (Spark
  // resolves catalog names lazily); UPDATE/MERGE resolve through the
  // GraftDmlRule injected by GraftExtensions.
  def tSqlPipeline(s: SparkSession, dir: String): DataFrame = {
    val cat = "graft_sqlop"
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.warehouse", scratch("t_sql_pipeline_wh", dir))
    s.sql(s"DROP TABLE IF EXISTS $cat.orders_sql")
    t(s, dir, "orders").createOrReplaceTempView("orders_src_sql")
    s.sql(
      s"""CREATE TABLE $cat.orders_sql USING graft
         |TBLPROPERTIES (primaryKey = 'o_orderkey', preCombineField = 'o_orderkey')
         |AS SELECT * FROM orders_src_sql""".stripMargin)
    s.sql(s"UPDATE $cat.orders_sql SET o_totalprice = o_totalprice + 100 " +
      "WHERE o_orderkey % 10 = 0")
    s.sql(s"DELETE FROM $cat.orders_sql WHERE o_orderstatus = 'F'")
    s.sql(
      s"""MERGE INTO $cat.orders_sql AS tgt
         |USING (SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey,
         |         'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         |       FROM orders_src_sql WHERE o_orderkey % 13 = 0) AS src
         |ON tgt.o_orderkey = src.o_orderkey
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(s"SELECT * FROM $cat.orders_sql ORDER BY o_orderkey")
  }

  private val tSqlPipelineSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
      |  o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderstatus <> 'F'
      |UNION ALL
      |SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 13 = 0
      |ORDER BY o_orderkey""".stripMargin

  // --- t_concurrent_upsert: optimistic multi-writer concurrency as an
  // ORACLED operator: two writers upsert DISJOINT key ranges through
  // separate table handles at the same time. The commit path is
  // first-committer-wins — a loser whose replaced files were superseded
  // gets CommitConflictException and RETRIES against the fresh snapshot
  // (re-resolving its rewrite set) — so the final state is deterministic
  // under every interleaving: exactly the multi-writer contract of many
  // concurrent ETL jobs sharing one 100 TB table.
  def tConcurrentUpsert(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_concurrent_upsert")
    tbl.insert(orders, numFiles = 4)
    def retryingUpsert(batch: DataFrame): Unit = {
      // a separate handle per writer: no shared in-process state beyond
      // the on-disk timeline, as two independent jobs would have
      val writer = GraftTable(s, GraftTableConfig(
        scratch("t_concurrent_upsert", dir), "o_orderkey", "o_orderkey"))
      var attempts = 0
      var done = false
      while (!done) {
        try { writer.upsert(batch); done = true }
        catch {
          // both are the transient faces of contention: losing the
          // first-committer race, and the lock wait-budget expiring on a
          // loaded host while the peer holds the lease (withReservedInstant
          // rolled the aborted attempt back either way — retry is safe)
          case e @ (_: CommitConflictException |
              _: graft.tables.LockTimeoutException) if attempts < 30 =>
            attempts += 1
            // linear backoff: an immediate retry re-runs the whole COW file
            // rewrite head-on into the other writer's next commit — at two
            // writers that's a livelock-ish storm (measured 3-4x op time).
            // A short growing pause lets the peer finish; the lease +
            // first-committer-wins check still provides all correctness.
            Thread.sleep(150L * attempts)
        }
      }
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writers = Seq(
      orders.filter(col("o_orderkey") % 2 === 0).withColumn("o_orderstatus", lit("E")),
      orders.filter(col("o_orderkey") % 2 === 1).withColumn("o_orderstatus", lit("D")))
      .map(b => Future(retryingUpsert(b)))
    Await.result(Future.sequence(writers), 600.seconds)
    tbl.read().orderBy("o_orderkey")
  }

  private val tConcurrentUpsertSql =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderkey % 2 = 0 THEN 'E' ELSE 'D' END AS o_orderstatus,
      |  o_totalprice, o_orderdate, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // --- t_shallow_clone: metadata-only shallow clone (Delta/Iceberg
  // CLONE): the clone's one commit references the source snapshot's live
  // files as external entries — zero bytes copied, stats carried over —
  // and stays PINNED while the source keeps mutating (the post-clone
  // delete on the source must not show through). Cloning a 100 TB table
  // is one timeline write.
  def tShallowClone(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_shallow_clone_src")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    val clone = GraftTable(s, GraftTableConfig(
      scratch("t_shallow_clone_dst", dir), "o_orderkey", "o_orderkey"))
    clone.dropIfExists()
    clone.cloneFrom(tbl)
    tbl.delete(col("o_orderstatus") === "F") // source moves on; clone is pinned
    clone.read().orderBy("o_orderkey")
  }

  // --- t_snapshot_export: export the latest snapshot as PLAIN parquet —
  // the HoodieSnapshotExporter analogue and bootstrap's inverse: a
  // downstream consumer without the graft reader gets a self-contained
  // directory (no timeline, no meta columns). One distributed
  // read-resolve-write pass (O(live files), no driver collect); the
  // export is then re-read RAW to prove it needs no graft machinery.
  def tSnapshotExport(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_snapshot_export")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    val out = scratch("t_snapshot_export_out", dir)
    tbl.read().write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy("o_orderkey")
  }

  // --- t_analyze: ANALYZE TABLE — the column-statistics table service
  // (Spark's ANALYZE ... COMPUTE STATISTICS FOR COLUMNS / Hudi's column
  // stats index build): one aggregation pass over the snapshot computes
  // per-column row/null/distinct counts and min/max, emitted as one row
  // per column. All counts are exact integers; min/max are rendered as
  // strings on both engines so the report schema is column-type-agnostic.
  // The single wide agg runs with map-side partials; COUNT(DISTINCT x, y,
  // z) in one agg becomes Spark's expand + two-phase distinct — no
  // per-column rescans.
  def tAnalyze(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_analyze")
    tbl.insert(orders, numFiles = 4)
    val snap = tbl.read()
    def statRow(c: String): Column = struct(
      lit(c).as("column_name"),
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col(c))).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).cast("string").as("min_value"),
      max(col(c)).cast("string").as("max_value"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    snap.agg(statRow(cols.head).as("s0"),
        cols.tail.zipWithIndex.map { case (c, i) => statRow(c).as(s"s${i + 1}") }: _*)
      .select(explode(array(cols.indices.map(i => col(s"s$i")): _*)).as("st"))
      .select("st.*")
      .orderBy("column_name")
  }

  private val tAnalyzeSql =
    """SELECT column_name, n_rows, n_nulls, n_distinct, min_value, max_value
      |FROM (
      |  SELECT 'o_orderkey' AS column_name, COUNT(*) AS n_rows,
      |    COUNT(*) - COUNT(o_orderkey) AS n_nulls,
      |    COUNT(DISTINCT o_orderkey) AS n_distinct,
      |    CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
      |    CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM orders
      |  UNION ALL
      |  SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
      |    COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS VARCHAR),
      |    CAST(MAX(o_custkey) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
      |    COUNT(DISTINCT o_orderstatus), CAST(MIN(o_orderstatus) AS VARCHAR),
      |    CAST(MAX(o_orderstatus) AS VARCHAR) FROM orders
      |  UNION ALL
      |  SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
      |    COUNT(DISTINCT o_orderpriority), CAST(MIN(o_orderpriority) AS VARCHAR),
      |    CAST(MAX(o_orderpriority) AS VARCHAR) FROM orders)
      |ORDER BY column_name""".stripMargin

  // --- t_keygen_timestamp: timestamp-based partition paths (yyyy-MM-dd).
  def tKeygenTimestamp(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_keygen_timestamp", dir), "event_id", "event_id",
      keyGen = TimestampDayPartition("ts", "p_day")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 2)
    tbl.readWhere(p => p >= "p_day=2024-01-05" && p <= "p_day=2024-01-11")
      .filter(col("p_day").between("2024-01-05", "2024-01-11"))
      .select("event_id", "p_day", "user_id", "value")
      .orderBy("event_id")
  }

  // --- t_mor_upsert: MERGE_ON_READ upsert — delta files + read-time
  // resolution must give exactly the COW answer (same oracle as t_upsert).
  def tMorUpsert(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_mor_upsert", dir), "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_mor_incremental: incremental read on a MERGE_ON_READ table —
  // the latest state of records changed in (i1, i2] must resolve through
  // the DELTA files (the upsert wrote no base rewrite), proving the
  // incremental path and the MOR resolution window compose.
  def tMorIncremental(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_mor_incremental", dir), "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    val i1 = tbl.insert(orders, numFiles = 4)
    val i2 = tbl.upsert(upsertBatch(orders))
    tbl.incremental(i1, i2).orderBy("o_orderkey")
  }

  // --- t_mor_compact: MOR upsert + tombstone delete + compaction; the
  // compacted base must equal the resolved view.
  def tMorCompact(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_mor_compact", dir), "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders))
    tbl.delete(col("o_orderstatus") === "F")
    tbl.compact(targetRows = 10000000L)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_incr_etl: incremental aggregate maintenance — a per-customer
  // rollup kept up to date from the upstream orders table via two
  // watermarked incremental runs (Hudi2Hudi / DeltaStreamer chaining).
  // Each run merges partial aggregates: matched rows ADD counts/sums.
  // The oracle is simply the full aggregate — incremental == batch.
  def tIncrEtl(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val src = GraftTable(s, GraftTableConfig(
      scratch("t_incr_etl_src", dir), "o_orderkey", "o_orderkey"))
    val tgt = GraftTable(s, GraftTableConfig(
      scratch("t_incr_etl_tgt", dir), "o_custkey", "o_custkey"))
    src.dropIfExists()
    tgt.dropIfExists()

    def transform(delta: DataFrame): DataFrame =
      delta.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("total_spend"))

    // commitMeta carries the watermark into the table commit: the additive
    // merge becomes exactly-once even across crash-retries
    def applyMerge(target: GraftTable, delta: DataFrame, meta: Map[String, String]): Unit =
      if (target.timeline.instants().isEmpty) { target.insert(delta, commitMeta = meta); () }
      else {
        target.merge(delta, whenMatchedUpdate = Some(Seq(
          "n_orders" -> (col("t.n_orders") + col("s.n_orders")),
          "total_spend" -> (col("t.total_spend") + col("s.total_spend"))
            .cast(DecimalType(18, 2)))), commitMeta = meta)
        ()
      }

    src.insert(orders.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    IncrementalPipeline.advance(src, tgt, "orders")(transform, applyMerge)
    src.insert(orders.filter(col("o_orderkey") % 2 === 1), numFiles = 2)
    IncrementalPipeline.advance(src, tgt, "orders")(transform, applyMerge)

    tgt.read()
      .select(col("o_custkey"), col("n_orders"),
        col("total_spend").cast("double").as("total_spend"))
      .orderBy("o_custkey")
  }

  // --- t_savepoint_restore: savepoint the initial snapshot, mutate twice,
  // restore — the table must be bit-identical to the savepointed state.
  def tSavepointRestore(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_savepoint_restore")
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.savepoint(i1)
    tbl.upsert(upsertBatch(orders))
    tbl.delete(col("o_orderstatus") === "F")
    tbl.restore(i1)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_delete_keys: keyed delete (RowKind -D / erasure path); candidate
  // files pruned by the key batch's range before any rewrite.
  def tDeleteKeys(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_delete_keys")
    tbl.insert(orders, numFiles = 4)
    tbl.deleteByKeys(orders.filter(col("o_orderkey") % 4 === 1).select("o_orderkey"))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_changelog: apply a RowKind changelog (+I / -U / +U / -D) — the
  // reference's HudiDataStreamWriter flow. -U pre-images are ignored;
  // updates, deletes, and inserts of new keys all land.
  def tChangelog(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_changelog")
    tbl.insert(orders, numFiles = 4)
    val pre = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("row_kind", lit("-U"))
    val post = upsertBatch(orders).withColumn("row_kind", lit("+U"))
    val dels = orders.filter(col("o_orderkey") % 10 =!= 0 && col("o_orderkey") % 7 === 3)
      .withColumn("row_kind", lit("-D"))
    val ins = orders.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
      .withColumn("o_orderstatus", lit("I"))
      .withColumn("row_kind", lit("+I"))
    tbl.applyChangelog(
      pre.unionByName(post).unionByName(dels).unionByName(ins), "row_kind", "o_orderkey")
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_bootstrap: metadata-only onboarding of an existing parquet file —
  // footer stats registered, no copy — then an upsert on top migrates only
  // colliding file groups into table-managed storage.
  def tBootstrap(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_bootstrap", dir), "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.bootstrap(s"$dir/orders.parquet")
    tbl.upsert(upsertBatch(orders))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_schema_drop: metadata-only column drop; later batches may omit the
  // column entirely, and reads never see it again.
  def tSchemaDrop(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_schema_drop")
    tbl.insert(orders, numFiles = 4)
    tbl.dropColumns(Seq("o_orderpriority"))
    tbl.upsert(upsertBatch(orders).drop("o_orderpriority"))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_data_skipping: per-file column stats + clustering = stats-pruned
  // range scan (Hudi col_stats data skipping). The value-clustered layout
  // makes most files prune away before any read is scheduled.
  def tDataSkipping(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_data_skipping", dir), "event_id", "event_id",
      statsCols = Seq("value")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 8)
    tbl.cluster(Seq("value"), numFiles = 8)
    tbl.readBetween("value", 50.0, 60.0).orderBy("event_id")
  }

  // --- t_partition_stats: Hudi-1.0 PARTITION_STATS index — per-partition
  // min/max of a stats column rolled up from file footer stats held in
  // timeline metadata. The table partitions by a DERIVED month string
  // (p_month=1996-03), so a range predicate on the raw o_orderdate
  // timestamp cannot be answered by partition-path pruning (the reader
  // would have to know the derivation); the partition-stats index answers
  // it in O(#partitions) and drops whole partitions before any per-file
  // metadata is consulted — at millions of files the difference between a
  // metadata scan and a lookup.
  def tPartitionStats(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_partition_stats", dir), "o_orderkey", "o_orderkey",
      keyGen = TimestampDayPartition("o_orderdate", "p_month", "yyyy-MM"),
      statsCols = Seq("o_orderdate")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 2)
    tbl.readBetweenPartitionStats("o_orderdate",
      java.sql.Timestamp.valueOf("1996-03-15 00:00:00"),
      java.sql.Timestamp.valueOf("1996-05-20 00:00:00"))
      .select(orders.columns.map(col).toSeq: _*) // drop the synthetic p_month
      .orderBy("o_orderkey")
  }

  private val tPartitionStatsSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1996-03-15 00:00:00' AND TIMESTAMP '1996-05-20 00:00:00'
      |ORDER BY o_orderkey""".stripMargin

  // --- t_expr_index: Hudi-1.0 expression index — per-file min/max of
  // date_trunc('MONTH', o_orderdate), a derived value no parquet footer
  // stores. Date-clustering first localizes each calendar month into few
  // files, so the March-1996 scan prunes most of the table before any task
  // is scheduled; an upsert AFTER the build leaves uncovered files that are
  // conservatively kept, and a refresh re-tightens the index incrementally.
  def tExprIndex(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_expr_index")
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderdate"), numFiles = 12)
    tbl.createExpressionIndex("order_month", "date_trunc('MONTH', o_orderdate)")
    tbl.upsert(upsertBatch(orders))
    tbl.refreshExpressionIndex("order_month")
    tbl.readExprBetween("order_month", "1996-03-01 00:00:00", "1996-03-01 00:00:00")
      .orderBy("o_orderkey")
  }

  // --- t_version: the table format up/downgrade surface (the reference's
  // utilities DowngradeTable.scala flow: downgrade a written table, verify
  // it still reads, move back up). Each step re-reads the TABLE — the row
  // count and key checksum prove version churn never touches data — and
  // the validation contract is exercised too: downgrading to a NEWER
  // version must throw, same-version must be a no-op.
  def tVersion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (tbl, orders) = ordersTable(s, dir, "t_version")
    tbl.insert(orders, numFiles = 4)
    def snap(step: String, changed: Boolean) = {
      val r = tbl.read().agg(count(lit(1)), sum(col("o_orderkey"))).head()
      (step, TableServices.tableVersion(tbl), changed, r.getLong(0), r.getLong(1))
    }
    val insert = snap("insert", changed = false)
    val down = { require(TableServices.downgradeTable(tbl, 0)); snap("downgrade", changed = true) }
    val noop = { require(!TableServices.downgradeTable(tbl, 0)); snap("downgrade_noop", changed = false) }
    val rejected =
      try { TableServices.downgradeTable(tbl, 2); false }
      catch { case _: IllegalArgumentException => true }
    require(rejected, "downgrade to a NEWER version must be rejected")
    val up = { require(TableServices.upgradeTable(tbl)); snap("upgrade", changed = true) }
    Seq(insert, down, noop, up)
      .toDF("step", "version", "changed", "n_rows", "key_sum")
      .orderBy("step")
  }

  // --- t_precommit: pre-commit validation (Hudi's SqlQueryPreCommitValidator)
  // — a registered SQL rule vetoes any commit whose CANDIDATE snapshot
  // violates it. The good upsert lands; the corrupting one (negative prices)
  // is rejected ATOMICALLY — its instant aborted, its files deleted — so the
  // table reads exactly as if the bad batch never arrived.
  def tPrecommit(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_precommit")
    tbl.insert(orders, numFiles = 4)
    tbl.addPreCommitValidator("no_negative_price",
      "SELECT 1 FROM graft_candidate WHERE o_totalprice < 0 LIMIT 1")
    tbl.upsert(upsertBatch(orders)) // clean batch: passes
    val corrupting = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * -1)
    val rejected =
      try { tbl.upsert(corrupting); false }
      catch { case e: IllegalStateException => e.getMessage.contains("no_negative_price") }
    require(rejected, "corrupting batch must be vetoed by the validator")
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_zorder: multi-dimensional data skipping — z-order clustering
  // interleaves (user_id, value) bits so ONE layout serves range predicates
  // on EITHER or BOTH dimensions (hoodie.clustering...layout.optimize
  // z-order); the 2-D box then prunes files via the same per-file stats as
  // t_data_skipping, and the caller's residual filter restates the box.
  def tZorder(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_zorder", dir), "event_id", "event_id",
      statsCols = Seq("user_id", "value")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 8)
    tbl.clusterZOrder("user_id", "value", numFiles = 16)
    tbl.readPruned(Seq(
        ColBound("user_id", Some(3L), Some(9L)),
        ColBound("value", Some(50.0), Some(150.0))))
      .filter(col("user_id").between(3L, 9L) && col("value").between(50.0, 150.0))
      .orderBy("event_id")
  }

  // --- t_insert_overwrite: INSERT OVERWRITE of whole partitions — the
  // Hudi insert_overwrite op. One partition's content is replaced; every
  // other partition is untouched; history stays time-travelable.
  def tInsertOverwrite(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) =
      ordersTable(s, dir, "t_insert_overwrite", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    // replace the 1-URGENT partition with its re-priced content
    tbl.insertOverwritePartitions(
      orders.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("o_orderstatus", lit("W")))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_drop_partition: DROP PARTITION — a metadata-only commit retires
  // the 1-URGENT partition; no data file is read or rewritten.
  def tDropPartition(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) =
      ordersTable(s, dir, "t_drop_partition", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    tbl.dropPartitions(_ == "o_orderpriority=1-URGENT")
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_ttl: partition TTL — day-partitioned events older than the cutoff
  // are retired in ONE metadata-only commit (Hudi's partition TTL
  // management); no data file is read or rewritten.
  def tTtl(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_ttl", dir), "event_id", "event_id",
      keyGen = TimestampDayPartition("ts", "p_day")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 2)
    val dropped = TableServices.expirePartitionsByValue(tbl, "p_day", "2024-01-08")
    require(dropped.nonEmpty, "TTL must retire the pre-cutoff partitions")
    tbl.read()
      .select("event_id", "p_day", "user_id", "value")
      .orderBy("event_id")
  }

  // --- t_rollback: undo the latest commit — its files are removed and the
  // replaced ones become live again purely through timeline resolution.
  def tRollback(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_rollback")
    tbl.insert(orders, numFiles = 4)
    val bad = tbl.upsert(orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * -1))
    tbl.rollback(bad)
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_schema_add: add-column schema evolution — a later batch carries a
  // NEW column; rows written before the evolution read it as NULL (the
  // mergeSchema semantics, served from the accumulated union schema with no
  // footer-scan inference job).
  def tSchemaAdd(s: SparkSession, dir: String): DataFrame = {
    val (tbl, orders) = ordersTable(s, dir, "t_schema_add")
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(upsertBatch(orders).withColumn("discount_pct", lit(5L)))
    tbl.read().orderBy("o_orderkey")
  }

  // --- t_ctas: CREATE TABLE AS SELECT (quickstart.sql:92-99).
  // --- t_repartition_evolve: partition-scheme evolution by rewrite — a
  // table laid out by order STATUS is rebuilt under a MONTH-based keygen
  // (the low-cardinality-to-time evolution every aging lakehouse table
  // goes through; Hudi/Iceberg style partition evolution without engine
  // support is exactly this full rewrite into a new root). Live data —
  // including an upsert wave committed under the OLD scheme — must arrive
  // intact under the new scheme; the oracle is the upserted orders table,
  // so any row lost or doubled across the rewrite fails the hash. At
  // scale the rewrite is one partitioned insert (shuffle on the new key),
  // and the old root stays readable until cutover. Month granularity is
  // deliberate: a DAY keygen here mints ~2.4k partitions of tiny files
  // (measured 5x slower end-to-end at sf0.01) — partition cardinality is
  // the evolution's primary design choice, and the op encodes the right
  // one.
  def tRepartitionEvolve(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val oldTbl = GraftTable(s, GraftTableConfig(
      scratch("t_repart_old", dir), "o_orderkey", "o_orderkey",
      keyGen = FieldPartition("o_orderstatus")))
    oldTbl.dropIfExists()
    oldTbl.insert(orders, numFiles = 2)
    oldTbl.upsert(upsertBatch(orders)) // live writes under the OLD scheme
    val newTbl = GraftTable(s, GraftTableConfig(
      scratch("t_repart_new", dir), "o_orderkey", "o_orderkey",
      keyGen = TimestampDayPartition("o_orderdate", outCol = "p_month", format = "yyyy-MM")))
    newTbl.dropIfExists()
    newTbl.insert(oldTbl.read().select(ordersCols.split(", ").map(col): _*), numFiles = 2)
    newTbl.read().select(ordersCols.split(", ").map(col): _*).orderBy("o_orderkey")
  }

  // --- t_multiformat_ingest: heterogeneous-source ingestion — orders land
  // in thirds as CSV files, JSON lines, and ORC, and all three are read
  // back with the ORIGINAL schema (no inference — inference samples data
  // and cannot be trusted at scale) and upserted into one table. This is
  // the parquet_to_hudi.sql bootstrap generalized to the formats a real
  // lake's landing zone actually holds; the oracle is the reassembled
  // orders table, so any type-fidelity loss in any format's round-trip
  // (timestamps through the TEXT formats are the classic casualty) fails
  // the hash check.
  def tMultiformatIngest(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val csvDir = scratch("t_multifmt_csv", dir)
    val jsonDir = scratch("t_multifmt_json", dir)
    val orcDir = scratch("t_multifmt_orc", dir)
    orders.filter(col("o_orderkey") % 3 === 0)
      .write.mode("overwrite").option("header", "true").csv(csvDir)
    orders.filter(col("o_orderkey") % 3 === 1)
      .write.mode("overwrite").json(jsonDir)
    orders.filter(col("o_orderkey") % 3 === 2)
      .write.mode("overwrite").orc(orcDir)
    val schema = orders.schema
    val fromCsv = s.read.schema(schema).option("header", "true").csv(csvDir)
    val fromJson = s.read.schema(schema).json(jsonDir)
    val fromOrc = s.read.schema(schema).orc(orcDir)
    val tbl = GraftTable(s, GraftTableConfig(
      scratch("t_multiformat_ingest", dir), "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(fromCsv, numFiles = 2)
    tbl.upsert(fromJson)
    tbl.upsert(fromOrc)
    tbl.read().select(ordersCols.split(", ").map(col): _*).orderBy("o_orderkey")
  }

  def tCtas(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val agg = orders.groupBy("o_custkey").agg(
      count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total_spend"))
    val tbl = GraftTable(s, GraftTableConfig(scratch("t_ctas", dir), "o_custkey", "o_custkey"))
    tbl.dropIfExists()
    tbl.insert(agg, numFiles = 2)
    tbl.read().orderBy("o_custkey")
  }

  override val all: Seq[QueryDef] = Seq(
    QueryDef("t_multiformat_ingest", tMultiformatIngest,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_repartition_evolve", tRepartitionEvolve,
      Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_insert", tInsert,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_upsert", tUpsert, Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_delete", tDelete,
      Some(s"SELECT $ordersCols FROM orders WHERE o_orderstatus <> 'F' ORDER BY o_orderkey")),
    QueryDef("t_merge", tMerge, Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_precombine_dedup", tPrecombineDedup, Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 2 ELSE 1 END AS ver
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_time_travel", tTimeTravel,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_incremental", tIncremental, Some(
      """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |  o_totalprice + 100 AS o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_mor_incremental", tMorIncremental, Some(
      """SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |  o_totalprice + 100 AS o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0 ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_cdc_view", tCdcView, Some(
      """WITH cur AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
        |         ELSE o_totalprice END AS price,
        |    CASE WHEN o_orderkey % 10 = 0 THEN 'U'
        |         ELSE o_orderstatus END AS st
        |  FROM orders)
        |SELECT o_orderpriority,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  COUNT(*) AS n_orders
        |FROM cur WHERE st <> 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("t_cdc", tCdc, Some(
      """SELECT 'update_preimage' AS _change_type, o_orderkey, o_custkey, o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT 'update_postimage', o_orderkey, o_custkey, 'U', o_totalprice + 100,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 10 = 0
        |UNION ALL
        |SELECT 'delete', o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 <> 0
        |ORDER BY _change_type, o_orderkey""".stripMargin)),
    // only the price changes: every other patch field is NULL and must keep
    // its stored value
    QueryDef("t_partial_update", tPartialUpdate, Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_clean", tClean, Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_compaction", tCompaction,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_clustering", tClustering,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_bucket_index", tBucketIndex, Some(
      s"SELECT $ordersCols FROM orders WHERE o_orderkey IN (1, 7, 42, 100, 999) ORDER BY o_orderkey")),
    QueryDef("t_bloom_index", tBloomIndex, Some(
      s"SELECT $ordersCols FROM orders WHERE o_orderkey IN (2, 8, 44, 104, 996) ORDER BY o_orderkey")),
    // the upsert re-stamps key%10==0 rows before the lookup, so the oracle
    // is the upserted view restricted to the looked-up keys
    QueryDef("t_record_index", tRecordIndex, Some(
      s"""$upsertedSql
         |WHERE o_orderkey IN (1, 7, 42, 100, 999)
         |ORDER BY o_orderkey""".stripMargin)),
    // four waves re-stamp key%11 in {1..4} before checkpoint + archive
    QueryDef("t_archive_timeline", tArchiveTimeline, Some(
      s"""SELECT o_orderkey, o_custkey,
         |  CASE WHEN o_orderkey % 11 IN (1, 2, 3, 4)
         |    THEN 'A' || CAST(o_orderkey % 11 AS VARCHAR)
         |    ELSE o_orderstatus END AS o_orderstatus,
         |  o_totalprice, o_orderdate, o_orderpriority
         |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_nbcc_upsert", tNbccUpsert, Some(tNbccUpsertSql)),
    // the waves re-stamp key%9 in {1,2} rows before the compacted lookup
    QueryDef("t_rli_compact", tRliCompact, Some(
      s"""SELECT o_orderkey, o_custkey,
         |  CASE WHEN o_orderkey % 9 IN (1, 2)
         |    THEN 'W' || CAST(o_orderkey % 9 AS VARCHAR)
         |    ELSE o_orderstatus END AS o_orderstatus,
         |  o_totalprice, o_orderdate, o_orderpriority
         |FROM orders WHERE o_orderkey IN (1, 7, 11, 12, 100, 999)
         |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_secondary_index", tSecondaryIndex, Some(
      s"""SELECT $ordersCols FROM orders
         |WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey""".stripMargin)),
    // the upsert re-priorities key%37==0 rows to 1-URGENT before the lookup
    QueryDef("t_si_compact", tSiCompact, Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  CASE WHEN o_orderkey % 37 = 0 THEN '1-URGENT'
        |       ELSE o_orderpriority END AS o_orderpriority
        |FROM orders
        |WHERE CASE WHEN o_orderkey % 37 = 0 THEN '1-URGENT'
        |           ELSE o_orderpriority END = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_si_rebuild", tSiRebuild, Some(
      s"""SELECT $ordersCols FROM orders
         |WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey""".stripMargin)),
    // the upsert re-stamps key%10==0 rows before the rebucket+lookup
    QueryDef("t_consistent_hash", tConsistentHash, Some(
      s"""$upsertedSql
         |WHERE o_orderkey IN (1, 7, 42, 100, 999, 1000)
         |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_schema_widen", tSchemaWiden, Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 10000000000 ELSE o_custkey END AS o_custkey,
        |  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_partition_prune", tPartitionPrune, Some(
      s"SELECT $ordersCols FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY o_orderkey")),
    QueryDef("t_analyze", tAnalyze, Some(tAnalyzeSql)),
    QueryDef("t_shallow_clone", tShallowClone, Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_snapshot_export", tSnapshotExport, Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_concurrent_upsert", tConcurrentUpsert, Some(tConcurrentUpsertSql)),
    QueryDef("t_sql_pipeline", tSqlPipeline, Some(tSqlPipelineSql)),
    QueryDef("t_incr_join_view", tIncrJoinView, Some(tIncrJoinViewSql)),
    QueryDef("t_metadata_files", tMetadataFiles, Some(
      """SELECT o_orderpriority, COUNT(*) AS n_rows,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("t_ttl", tTtl, Some(
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS p_day, user_id, value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-08'
        |ORDER BY event_id""".stripMargin)),
    QueryDef("t_keygen_timestamp", tKeygenTimestamp, Some(
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS p_day, user_id, value
        |FROM events
        |WHERE strftime(ts, '%Y-%m-%d') BETWEEN '2024-01-05' AND '2024-01-11'
        |ORDER BY event_id""".stripMargin)),
    QueryDef("t_mor_upsert", tMorUpsert, Some(s"$upsertedSql ORDER BY o_orderkey")),
    // delete(status='F') runs after the upsert, so F-rows that the upsert
    // re-stamped to 'U' (key % 10 = 0) survive
    QueryDef("t_mor_compact", tMorCompact, Some(
      s"""$upsertedSql
         |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 <> 0)
         |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_savepoint_restore", tSavepointRestore,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_delete_keys", tDeleteKeys, Some(
      s"SELECT $ordersCols FROM orders WHERE o_orderkey % 4 <> 1 ORDER BY o_orderkey")),
    QueryDef("t_changelog", tChangelog, Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders WHERE NOT (o_orderkey % 10 <> 0 AND o_orderkey % 7 = 3)
        |UNION ALL
        |SELECT o_orderkey + 20000000 AS o_orderkey, o_custkey, 'I' AS o_orderstatus,
        |  o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderkey % 13 = 0
        |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_bootstrap", tBootstrap, Some(s"$upsertedSql ORDER BY o_orderkey")),
    QueryDef("t_schema_drop", tSchemaDrop, Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    // the rejected batch leaves no trace: the oracle is just the clean
    // upserted view
    QueryDef("t_precommit", tPrecommit, Some(s"$upsertedSql ORDER BY o_orderkey")),
    // the version walk is declarative (v1 -> v0 -> v0 no-op -> v1) and the
    // count/checksum re-read at every step must equal the source table's
    QueryDef("t_version", tVersion, Some(
      """SELECT * FROM (
        |  SELECT 'insert' AS step, 1 AS version, false AS changed,
        |    COUNT(*) AS n_rows, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum FROM orders
        |  UNION ALL SELECT 'downgrade', 0, true,
        |    COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'downgrade_noop', 0, false,
        |    COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL SELECT 'upgrade', 1, true,
        |    COUNT(*), CAST(SUM(o_orderkey) AS BIGINT) FROM orders
        |) ORDER BY step""".stripMargin)),
    // the upsert re-stamps key%10==0 rows before the indexed scan
    QueryDef("t_expr_index", tExprIndex, Some(
      s"""$upsertedSql
         |WHERE date_trunc('month', o_orderdate) = TIMESTAMP '1996-03-01'
         |ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_zorder", tZorder, Some(
      """SELECT event_id, user_id, event_type, value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50.0 AND 150.0
        |ORDER BY event_id""".stripMargin)),
    QueryDef("t_data_skipping", tDataSkipping, Some(
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE value BETWEEN 50.0 AND 60.0
        |ORDER BY event_id""".stripMargin)),
    QueryDef("t_partition_stats", tPartitionStats, Some(tPartitionStatsSql)),
    QueryDef("t_insert_overwrite", tInsertOverwrite, Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'W' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_rollback", tRollback,
      Some(s"SELECT $ordersCols FROM orders ORDER BY o_orderkey")),
    QueryDef("t_drop_partition", tDropPartition, Some(
      s"""SELECT $ordersCols FROM orders
         |WHERE o_orderpriority <> '1-URGENT' ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_schema_add", tSchemaAdd, Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        |  CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100 ELSE o_totalprice END AS o_totalprice,
        |  o_orderdate, o_orderpriority,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 5 ELSE NULL END AS discount_pct
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    QueryDef("t_ctas", tCtas, Some(
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)),
    QueryDef("t_incr_etl", tIncrEtl, Some(
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)))
}
