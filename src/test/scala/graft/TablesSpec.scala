package graft

import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GraftTable internals that the DuckDB oracle can't observe: COW file
  * pruning, compaction/clustering layout, bucket-index lookup pruning,
  * timeline atomicity, cleaning. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(name: String, numBuckets: Int = 0,
      keyGen: KeyGen = NoPartition, changelog: Boolean = false): GraftTable = {
    val tbl = GraftTable(spark, GraftTableConfig(
      s"/tmp/graft_spec/$name", "o_orderkey", "o_orderkey",
      keyGen = keyGen, numBuckets = numBuckets, writeChangelog = changelog))
    tbl.dropIfExists()
    tbl
  }

  private def orders = GraftSession.table(spark, sfDir, "orders")

  test("upsert rewrites only files containing batch keys (COW pruning)") {
    val tbl = freshTable("cow_prune")
    tbl.insert(orders, numFiles = 8)
    val before = tbl.timeline.liveFiles(None).map(_.path).toSet
    assert(before.size == 8)

    // single-key upsert must not rewrite the whole table
    val one = orders.filter(col("o_orderkey") === 42)
      .withColumn("o_orderstatus", lit("Z"))
    val i2 = tbl.upsert(one)
    val c = tbl.timeline.readCommit(i2)
    assert(c.removes.size < before.size,
      s"upsert of 1 key rewrote ${c.removes.size} of ${before.size} files")
    assert(tbl.read().filter(col("o_orderkey") === 42).select("o_orderstatus")
      .head().getString(0) == "Z")
    assert(tbl.read().count() == orders.count())
  }

  test("bucket index prunes point-lookup file set") {
    val tbl = freshTable("bucket_prune", numBuckets = 8)
    tbl.insert(orders, numFiles = 4) // 8 buckets x up-to-4 files
    val total = tbl.timeline.liveFiles(None).size
    val touched = tbl.lookupFiles(Seq(7L)).size
    assert(total >= 8)
    assert(touched <= total / 4,
      s"point lookup touched $touched of $total files — bucket pruning broken")
    assert(tbl.pointLookup(Seq(7L)).count() == 1)
  }

  test("compaction bin-packs files and preserves content") {
    val tbl = freshTable("compact")
    (0 to 2).foreach(m => tbl.insert(orders.filter(col("o_orderkey") % 3 === m), numFiles = 6))
    assert(tbl.timeline.liveFiles(None).size == 18)
    tbl.compact(targetRows = 1000000L)
    assert(tbl.timeline.liveFiles(None).size == 1)
    assert(tbl.read().count() == orders.count())
  }

  test("clustering range-partitions files by sort key") {
    val tbl = freshTable("cluster")
    tbl.insert(orders, numFiles = 6)
    tbl.cluster(Seq("o_custkey"), numFiles = 4)
    val snap = tbl.read().withColumn("f", input_file_name())
    // files must hold disjoint o_custkey ranges after range clustering
    val ranges = snap.groupBy("f")
      .agg(min("o_custkey").as("mn"), max("o_custkey").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, mx1), (mn2, _)) => assert(mx1 <= mn2, s"overlapping ranges $ranges")
      case _ =>
    }
  }

  test("partition pruning reaches the file index") {
    val tbl = freshTable("part_prune", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    val all = tbl.timeline.liveFiles(None).size
    val prunedFiles = tbl.partitionFiles(_ == "o_orderpriority=1-URGENT").size
    assert(prunedFiles < all, s"pruned to $prunedFiles of $all files")
    val pruned = tbl.readWhere(_ == "o_orderpriority=1-URGENT")
    val scanned = pruned.select(input_file_name()).distinct().count()
    assert(scanned == prunedFiles, s"scanned $scanned, expected $prunedFiles")
    assert(pruned.count() ==
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
    // multi-commit partitioned reads must not trip partition inference
    tbl.upsert(orders.limit(20).withColumn("o_totalprice", lit(0.0)))
    assert(tbl.read().count() == orders.count())
  }

  test("clean physically removes replaced files") {
    val tbl = freshTable("clean")
    tbl.insert(orders, numFiles = 4)
    val i2 = tbl.compact(targetRows = 1000000L)
    val removed = tbl.clean(i2)
    assert(removed == 4)
    assert(tbl.read().count() == orders.count()) // live snapshot untouched
  }

  test("time travel + incremental agree with the timeline") {
    val tbl = freshTable("tt")
    val i1 = tbl.insert(orders, numFiles = 2)
    val batch = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val i2 = tbl.upsert(batch)
    assert(tbl.readAsOf(i1).count() == orders.count())
    val inc = tbl.incremental(i1, i2)
    assert(inc.count() == batch.count())
    assert(tbl.read().count() == orders.count())
  }

  test("merge with custom matched-update projection") {
    val tbl = freshTable("merge_custom")
    tbl.insert(orders, numFiles = 2)
    val src = orders.filter(col("o_orderkey") % 50 === 0)
      .withColumn("o_totalprice", lit(-1.0))
    tbl.merge(src,
      whenMatchedUpdate = Some(Seq(
        "o_totalprice" -> (col("t.o_totalprice") + col("s.o_totalprice")))),
      whenNotMatchedInsert = false)
    val got = tbl.read().filter(col("o_orderkey") === 0).select("o_totalprice").head().getDouble(0)
    val want = orders.filter(col("o_orderkey") === 0).select("o_totalprice").head().getDouble(0) - 1.0
    assert(math.abs(got - want) < 1e-9)
  }

  test("MOR: upserts append deltas without rewriting base; compact folds them") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/mor", "o_orderkey", "o_orderkey", tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    val baseFiles = tbl.timeline.liveFiles(None).map(_.path).toSet
    val batch = orders.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("M"))
    val i2 = tbl.upsert(batch)
    val c2 = tbl.timeline.readCommit(i2)
    assert(c2.op == "delta" && c2.removes.isEmpty, "MOR upsert must not rewrite files")
    assert(baseFiles.subsetOf(tbl.timeline.liveFiles(None).map(_.path).toSet))
    // resolution: updated rows visible exactly once
    assert(tbl.read().count() == orders.count())
    assert(tbl.read().filter(col("o_orderstatus") === "M").count() == batch.count())
    // tombstone delete then compact
    tbl.delete(col("o_orderkey") % 7 === 0)
    assert(tbl.read().count() == orders.count() - batch.count())
    val before = tbl.timeline.liveFiles(None).size
    tbl.compact(targetRows = 10000000L)
    assert(tbl.timeline.liveFiles(None).size < before)
    assert(tbl.read().count() == orders.count() - batch.count())
    // time travel still sees the pre-delete state
    assert(tbl.readAsOf(i2).filter(col("o_orderstatus") === "M").count() == batch.count())
  }

  test("timeline OCC: instant reservation is exclusive; stale commits rejected") {
    val tbl = freshTable("occ")
    tbl.insert(orders, numFiles = 2)
    val t = tbl.timeline
    val i1 = t.reserveInstant()
    val i2 = t.reserveInstant() // second reservation must not collide
    assert(i1 != i2)
    // a commit claiming to replace a file that is no longer live must abort
    val bogus = Commit(i1, "upsert", Nil, Seq("data/99999/nonexistent.parquet"))
    assertThrows[IllegalStateException](t.commit(bogus))
    // MARKER-COVERAGE INVARIANT: an instant is covered by at least one of
    // {.inflight, .commit.json, .rolledback} at every moment. The conflict
    // throw must NOT strip the .inflight marker — in the window before the
    // loser's abort() lands its tombstone, an uncovered max instant would
    // be re-derived and re-reserved by a concurrent writer, whose files
    // the loser's cleanup then deletes (found by ConcurrencyStress as
    // silent row loss under 2 OCC writers)
    val meta = new java.io.File(s"/tmp/graft_spec/occ/_graft")
    assert(new java.io.File(meta, s"$i1.inflight").exists(),
      "conflict loser dropped its .inflight before the tombstone landed")
    // covered: a racing reservation can never re-issue i1
    assert(t.reserveInstant().toLong > i2.toLong)
    t.abort(i1)
    assert(new java.io.File(meta, s"$i1.rolledback").exists())
    assert(!new java.io.File(meta, s"$i1.inflight").exists())
    assert(t.reserveInstant() != i1)
    // a valid commit on the later reserved instant still succeeds
    t.commit(Commit(i2, "noop", Nil, Nil))
    assert(t.instants().contains(i2))
  }

  test("wall-clock time travel resolves to the right instant") {
    val tbl = freshTable("wallclock")
    tbl.insert(orders.limit(10), numFiles = 1)
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(1100)
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", lit("Z")))
    assert(tbl.readAsOfTimestamp(afterFirst)
      .filter(col("o_orderstatus") === "Z").count() == 0)
    assert(tbl.readAsOfTimestamp(System.currentTimeMillis())
      .filter(col("o_orderstatus") === "Z").count() == 10)
  }

  test("spark.sql runs over a registered graft view") {
    val tbl = freshTable("sqlview")
    tbl.insert(orders, numFiles = 2)
    tbl.createOrReplaceView("graft_orders")
    val got = spark.sql(
      "SELECT o_orderstatus, COUNT(*) AS n FROM graft_orders GROUP BY 1 ORDER BY 1")
    val want = orders.groupBy("o_orderstatus").count().orderBy("o_orderstatus")
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      want.collect().map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("NUM_OR_TIME compaction trigger fires on commit count") {
    val tbl = freshTable("svc_compact")
    (0 to 2).foreach(m => tbl.insert(orders.filter(col("o_orderkey") % 3 === m), numFiles = 2))
    // 3 commits < 5 and young: no trigger
    assert(TableServices.maybeCompact(tbl, 1000000L, deltaCommits = 5, deltaSeconds = 3600).isEmpty)
    // commit-count trigger
    val fired = TableServices.maybeCompact(tbl, 1000000L, deltaCommits = 3, deltaSeconds = 3600)
    assert(fired.nonEmpty)
    assert(tbl.timeline.readCommit(fired.get).op == "compact")
    // nothing new since the compaction: no re-trigger
    assert(TableServices.maybeCompact(tbl, 1000000L, deltaCommits = 1, deltaSeconds = 0).isEmpty)
    assert(tbl.read().count() == orders.count())
  }

  test("table version upgrade/downgrade contract matches the reference") {
    val tbl = freshTable("svc_version")
    tbl.insert(orders.limit(10), numFiles = 1)
    assert(TableServices.tableVersion(tbl) == 1)
    assert(!TableServices.downgradeTable(tbl, 1)) // same version: no-op
    assertThrows[IllegalArgumentException](TableServices.downgradeTable(tbl, 2))
    assert(TableServices.downgradeTable(tbl, 0))
    assert(TableServices.tableVersion(tbl) == 0)
    assert(TableServices.upgradeTable(tbl))
    assert(TableServices.tableVersion(tbl) == 1)
  }

  test("bucketFor matches the physical file layout") {
    val tbl = freshTable("bucket_for", numBuckets = 8)
    tbl.insert(orders, numFiles = 1)
    Seq(1L, 42L, 999L).foreach { k =>
      val b = tbl.bucketFor(k)
      val files = tbl.lookupFiles(Seq(k))
      assert(files.nonEmpty && files.forall(_.bucket == b),
        s"key $k: bucketFor=$b but files in ${files.map(_.bucket)}")
    }
  }

  test("incremental pipeline: watermark advances once and only with new data") {
    val src = freshTable("ip_src")
    val tgt = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/ip_tgt", "o_custkey", "o_custkey"))
    tgt.dropIfExists()
    var crashAfterApply = false
    def run() = IncrementalPipeline.advance(src, tgt, "src")(
      _.groupBy("o_custkey").agg(count(lit(1)).as("n_orders")),
      (t, df, m) => {
        if (t.timeline.instants().isEmpty) t.insert(df, commitMeta = m)
        else t.merge(df, whenMatchedUpdate =
          Some(Seq("n_orders" -> (col("t.n_orders") + col("s.n_orders")))), commitMeta = m)
        if (crashAfterApply) throw new RuntimeException("simulated crash after apply")
      })
    src.insert(orders.limit(500), numFiles = 2)
    assert(run().nonEmpty)
    assert(IncrementalPipeline.lastApplied(tgt, "src").contains("000000001"))
    // caught up: no-op
    assert(run().isEmpty)
    // new upstream commit, and the run CRASHES after the merge lands but
    // before the watermark hint is written
    src.insert(orders.filter(col("o_orderkey") >= 500), numFiles = 2)
    crashAfterApply = true
    assertThrows[RuntimeException](run())
    crashAfterApply = false
    // retry must NOT double-apply: the watermark is in the target's commit
    // metadata, atomic with the merge
    assert(run().isEmpty)
    val total = tgt.read().agg(sum("n_orders")).head().getLong(0)
    assert(total == orders.count())
  }

  test("schema evolution: upsert batches may add columns; old rows read null") {
    val tbl = freshTable("evolve")
    tbl.insert(orders, numFiles = 2)
    val batch = orders.filter(col("o_orderkey") % 4 === 0)
      .withColumn("o_channel", lit("web")) // new column
    tbl.upsert(batch)
    val snap = tbl.read()
    assert(snap.columns.contains("o_channel"))
    assert(snap.filter(col("o_channel") === "web").count() == batch.count())
    assert(snap.filter(col("o_channel").isNull).count() == orders.count() - batch.count())
    // further upserts WITHOUT the new column still work
    tbl.upsert(orders.filter(col("o_orderkey") === 1).withColumn("o_orderstatus", lit("Z")))
    assert(tbl.read().count() == orders.count())
  }

  test("bloom filters prune point lookups beyond range checks") {
    val tbl = freshTable("bloom")
    // unordered inserts: every file spans nearly the full key range, so
    // range pruning keeps all files and only the bloom can discriminate
    tbl.insert(orders, numFiles = 10)
    val all = tbl.timeline.liveFiles(None).size
    val touched = tbl.lookupFiles(Seq(42L)).size
    assert(touched < all, s"bloom pruning ineffective: $touched of $all files")
    assert(tbl.pointLookup(Seq(42L)).count() == 1) // no false negatives
    // a key that doesn't exist prunes everything (or nearly)
    assert(tbl.lookupFiles(Seq(99999999L)).isEmpty)
  }

  test("z-order clustering bounds per-file ranges in BOTH dimensions") {
    def fileBoxes(tbl: GraftTable): Array[(Double, Double)] = {
      val snap = tbl.read().withColumn("f", input_file_name())
      snap.groupBy("f").agg(
        (max("o_custkey") - min("o_custkey")).cast("double").as("cr"),
        (max("o_orderkey") - min("o_orderkey")).cast("double").as("or"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    }
    val zt = freshTable("zorder")
    zt.insert(orders, numFiles = 8)
    zt.clusterZOrder("o_custkey", "o_orderkey", numFiles = 16)
    assert(zt.read().count() == orders.count())
    val lin = freshTable("zorder_lin")
    lin.insert(orders, numFiles = 8)
    lin.cluster(Seq("o_custkey"), numFiles = 16)
    // z-order balances extents across BOTH dimensions: under a single-column
    // custkey sort every file spans nearly the FULL o_orderkey domain, while
    // z-ordered files must stay bounded in o_orderkey too
    val oDomain = orders.count().toDouble // orderkeys are 0..n-1
    val zO = fileBoxes(zt).map(_._2 / oDomain)
    val lO = fileBoxes(lin).map(_._2 / oDomain)
    val (zAvg, lAvg) = (zO.sum / zO.length, lO.sum / lO.length)
    assert(lAvg > 0.9, s"baseline files unexpectedly bounded in orderkey: $lAvg")
    assert(zAvg < 0.5 * lAvg, s"z-order orderkey extent $zAvg !<< linear $lAvg")
  }

  test("3-dim z-order bounds per-file ranges in every dimension") {
    val zt = freshTable("zorder3")
    val src = orders.withColumn("o_day", dayofyear(col("o_orderdate")))
    zt.insert(src, numFiles = 8)
    zt.clusterZOrder(Seq("o_custkey", "o_orderkey", "o_day"), numFiles = 27)
    assert(zt.read().count() == orders.count())
    // every file must be bounded well below the full domain in EACH dim
    val spans = zt.read().withColumn("f", input_file_name())
      .groupBy("f").agg(
        ((max("o_custkey") - min("o_custkey")) /
          lit(orders.agg(max("o_custkey")).head().getLong(0).toDouble)).as("c"),
        ((max("o_orderkey") - min("o_orderkey")) /
          lit(orders.count().toDouble)).as("o"),
        ((max("o_day") - min("o_day")) / 366.0).as("d"))
      .agg(avg("c"), avg("o"), avg("d")).head()
    assert(spans.getDouble(0) < 0.7, s"custkey extent ${spans.getDouble(0)}")
    assert(spans.getDouble(1) < 0.7, s"orderkey extent ${spans.getDouble(1)}")
    assert(spans.getDouble(2) < 0.7, s"day extent ${spans.getDouble(2)}")
  }

  test("wide-table upsert: 32-column TPC-DS-ish rows round-trip (glue Job.py shape)") {
    // the reference's glue bench upserts a wide store_sales-like table;
    // build one deterministically from orders (30 derived measure cols)
    var wide = orders.select("o_orderkey", "o_custkey")
    (1 to 30).foreach { i =>
      wide = wide.withColumn(f"m_$i%02d", (col("o_orderkey") * i % 997).cast("long"))
    }
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/wide_table", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(wide, numFiles = 4)
    val batch = wide.filter(col("o_orderkey") % 5 === 0)
      .withColumn("m_01", lit(-1L))
    tbl.upsert(batch)
    val got = tbl.read()
    assert(got.columns.length == 32)
    assert(got.count() == wide.count())
    assert(got.filter(col("m_01") === -1L).count() == batch.count())
    // untouched wide columns survive the rewrite bit-for-bit
    val want = wide.withColumn("m_01",
      when(col("o_orderkey") % 5 === 0, -1L).otherwise(col("m_01")))
    assert(got.orderBy("o_orderkey").collect()
      .sameElements(want.selectExpr(got.columns.map(c => s"`$c`"): _*)
        .orderBy("o_orderkey").collect()))
  }

  test("deleting every row leaves a readable empty snapshot, not an error") {
    val tbl = freshTable("delete_all")
    tbl.insert(orders.limit(100), numFiles = 2)
    tbl.delete(lit(true))
    val snap = tbl.read()
    assert(snap.count() == 0)
    assert(snap.columns.contains("o_orderkey")) // schema preserved
    assert(tbl.pointLookup(Seq(1L)).count() == 0)
    // history is intact and the table accepts new writes
    assert(tbl.readAsOf(Timeline.pad(1)).count() == 100)
    tbl.upsert(orders.limit(10))
    assert(tbl.read().count() == 10)
  }

  test("delete keeps rows whose predicate evaluates to NULL") {
    val tbl = freshTable("null_delete")
    // schema-evolve in a nullable column: old rows have o_channel = NULL
    tbl.insert(orders.limit(100), numFiles = 1)
    tbl.upsert(orders.limit(100).filter(col("o_orderkey") < 30)
      .withColumn("o_channel", lit("web")))
    tbl.delete(col("o_channel") === "web")
    // NULL = 'web' rows must survive; only the 30 'web' rows go
    assert(tbl.read().count() == 70)
    assert(tbl.read().filter(col("o_channel").isNull).count() == 70)
  }

  test("rollback undoes the latest commit and revives replaced files") {
    val tbl = freshTable("rollback")
    tbl.insert(orders, numFiles = 2)
    val i2 = tbl.upsert(orders.limit(20).withColumn("o_orderstatus", lit("R")))
    assert(tbl.read().filter(col("o_orderstatus") === "R").count() == 20)
    tbl.rollback(i2)
    assert(tbl.read().filter(col("o_orderstatus") === "R").count() == 0)
    assert(tbl.read().count() == orders.count())
    // non-latest rollback refused
    val i3 = tbl.upsert(orders.limit(5).withColumn("o_orderstatus", lit("S")))
    assertThrows[IllegalArgumentException](tbl.rollback("000000001"))
    assert(tbl.timeline.latestInstant().contains(i3))
  }

  test("insert overwrite replaces whole partitions") {
    val tbl = freshTable("ins_ovr", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    val urgentFixed = orders.filter(col("o_orderpriority") === "1-URGENT")
      .limit(100).withColumn("o_totalprice", lit(1.0))
    tbl.insertOverwritePartitions(urgentFixed)
    val snap = tbl.read()
    // the 1-URGENT partition now holds ONLY the overwrite batch
    assert(snap.filter(col("o_orderpriority") === "1-URGENT").count() == 100)
    assert(snap.filter(col("o_orderpriority") === "1-URGENT" &&
      col("o_totalprice") =!= 1.0).count() == 0)
    // other partitions untouched
    assert(snap.filter(col("o_orderpriority") =!= "1-URGENT").count() ==
      orders.filter(col("o_orderpriority") =!= "1-URGENT").count())
  }

  test("history and storageStats reflect the timeline") {
    val tbl = freshTable("stats", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    tbl.upsert(orders.limit(10).withColumn("o_totalprice", lit(9.99)))
    val h = tbl.history().collect()
    assert(h.map(_.getString(1)).toSeq == Seq("insert", "upsert"))
    assert(h.head.getLong(4) == orders.count()) // rows written by the insert
    val s = tbl.storageStats()
    assert(s.count() == 5) // one row per priority partition
    assert(s.agg(sum("n_rows")).head().getLong(0) >= orders.count())
  }

  test("approx_count_distinct within 5% of exact") {
    val li = GraftSession.table(spark, sfDir, "lineitem")
    val approx = li.agg(approx_count_distinct("l_partkey").as("a")).head().getLong(0)
    val exact = li.agg(countDistinct("l_partkey").as("e")).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("point lookup pads Short keys like the file stats do") {
    val df = orders.limit(50)
      .select(col("o_orderkey").cast("short").as("k"), col("o_totalprice"))
    val tbl = GraftTable(spark, GraftTableConfig("/tmp/graft_spec/short_key", "k", "k"))
    tbl.dropIfExists()
    tbl.insert(df, numFiles = 2)
    val key = df.head().getShort(0)
    // unpadded "42" vs padded file min/max would prune every file and
    // silently return empty — the padding must match keyStr's
    assert(tbl.lookupFiles(Seq(key)).nonEmpty)
    assert(tbl.pointLookup(Seq(key)).count() == 1)
  }

  test("savepoint protects files from clean; restore rewinds to the snapshot") {
    val tbl = freshTable("savepoint")
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.savepoint(i1)
    tbl.upsert(orders.limit(50).withColumn("o_orderstatus", lit("Z")))
    val i3 = tbl.compact(targetRows = 10000000L)
    // clean must NOT delete files the savepointed snapshot still needs
    tbl.clean(i3)
    assert(tbl.readAsOf(i1).count() == orders.count(),
      "clean deleted files needed by the savepoint")
    // restore rewinds: later commits rolled back newest-first
    tbl.restore(i1)
    assert(tbl.timeline.latestInstant().contains(i1))
    assert(tbl.read().filter(col("o_orderstatus") === "Z").count() == 0)
    assert(tbl.read().count() == orders.count())
    // restore to a non-savepointed instant is refused
    tbl.upsert(orders.limit(5).withColumn("o_orderstatus", lit("Q")))
    assertThrows[IllegalArgumentException](tbl.restore("000000099"))
  }

  test("deleteByKeys prunes candidate files by the key batch's range") {
    val tbl = freshTable("del_keys")
    // range-clustered layout so a narrow key batch hits few files
    tbl.insert(orders, numFiles = 8)
    tbl.cluster(Seq("o_orderkey"), numFiles = 8)
    val live = tbl.timeline.liveFiles(None).size
    val keys = orders.filter(col("o_orderkey") < 50).select("o_orderkey")
    val i = tbl.deleteByKeys(keys)
    val c = tbl.timeline.readCommit(i)
    assert(c.removes.size < live / 2,
      s"keyed delete rewrote ${c.removes.size} of $live files")
    assert(tbl.read().count() == orders.count() - 50)
    assert(tbl.read().filter(col("o_orderkey") < 50).count() == 0)
    // MOR path: tombstones, no rewrite
    val mor = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/del_keys_mor", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    mor.dropIfExists()
    mor.insert(orders, numFiles = 2)
    val im = mor.deleteByKeys(orders.filter(col("o_orderkey") < 10).select("o_orderkey"))
    assert(mor.timeline.readCommit(im).removes.isEmpty)
    assert(mor.read().count() == orders.count() - 10)
  }

  test("applyChangelog: last action per key wins; -U pre-images ignored") {
    val tbl = freshTable("changelog")
    tbl.insert(orders, numFiles = 2)
    val n = orders.count()
    // same key updated (seq 1) then deleted (seq 2): delete must win
    val k0 = orders.limit(1)
    val changes =
      k0.withColumn("row_kind", lit("-U")).withColumn("seq", lit(1L))
        .unionByName(k0.withColumn("o_orderstatus", lit("U"))
          .withColumn("row_kind", lit("+U")).withColumn("seq", lit(1L)))
        .unionByName(k0.withColumn("row_kind", lit("-D")).withColumn("seq", lit(2L)))
    tbl.applyChangelog(changes, "row_kind", "seq")
    assert(tbl.read().count() == n - 1)
    val key0 = k0.head().getLong(0)
    assert(tbl.read().filter(col("o_orderkey") === key0).count() == 0)
  }

  test("bootstrap registers external files without copying; upsert migrates") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/bootstrap", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.bootstrap(s"$sfDir/orders.parquet")
    // zero-copy: no data/ dir yet, snapshot == source
    assert(!new java.io.File("/tmp/graft_spec/bootstrap/data").exists())
    assert(tbl.read().count() == orders.count())
    assert(tbl.timeline.liveFiles(None).forall(_.path.startsWith("ext:")))
    // upsert on top: migrates colliding groups into managed storage
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", lit("B")))
    assert(tbl.read().count() == orders.count())
    assert(tbl.read().filter(col("o_orderstatus") === "B").count() == 10)
    // delete works across mixed external/managed files
    tbl.delete(col("o_orderstatus") === "B")
    assert(tbl.read().count() == orders.count() - 10)
    // clean never touches the external source file
    tbl.clean(tbl.timeline.latestInstant().get)
    assert(new java.io.File(s"$sfDir/orders.parquet").exists())
    assert(GraftSession.table(spark, sfDir, "orders").count() == orders.count())
  }

  test("dropColumns hides the column immediately and purges it on rewrite") {
    val tbl = freshTable("drop_col")
    tbl.insert(orders, numFiles = 2)
    tbl.dropColumns(Seq("o_comment_missing_ok", "o_orderpriority"))
    assert(!tbl.read().columns.contains("o_orderpriority"))
    // key/precombine columns are protected
    assertThrows[IllegalArgumentException](tbl.dropColumns(Seq("o_orderkey")))
    // a rewrite physically purges the dropped column from rewritten files
    tbl.compact(targetRows = 10000000L)
    val files = tbl.timeline.liveFiles(None)
    val physical = spark.read.parquet(s"/tmp/graft_spec/drop_col/${files.head.path}")
    assert(!physical.columns.contains("o_orderpriority"))
    assert(tbl.read().count() == orders.count())
  }

  test("failed mutation leaks neither inflight markers nor orphan data files") {
    val tbl = freshTable("orphan_cleanup")
    tbl.insert(orders.limit(100), numFiles = 2)
    // negative keys are rejected in the footer-stats pass, AFTER the data
    // files are on disk — the cleanup path must remove them and tombstone
    // the reserved instant
    assertThrows[Exception](
      tbl.upsert(orders.limit(5).withColumn("o_orderkey", lit(-1L))))
    val meta = new java.io.File("/tmp/graft_spec/orphan_cleanup/_graft").listFiles().map(_.getName)
    assert(!meta.exists(_.endsWith(".inflight")))
    assert(meta.exists(_.endsWith(".rolledback")))
    assert(tbl.timeline.instants().size == 1)
    val dataDirs = new java.io.File("/tmp/graft_spec/orphan_cleanup/data")
      .listFiles().map(_.getName).toSet
    assert(dataDirs == tbl.timeline.instants().toSet) // no orphan instant dirs
    assert(tbl.read().count() == 100) // table state untouched
  }

  test("cleanRetainCommits keeps the last N snapshots readable, drops older files") {
    val tbl = freshTable("clean_retain")
    tbl.insert(orders, numFiles = 2)
    (1 to 3).foreach { m =>
      tbl.upsert(orders.filter(col("o_orderkey") % 20 === m)
        .withColumn("o_orderstatus", lit(s"R$m")))
    }
    val instants = tbl.timeline.instants()
    assert(tbl.cleanRetainCommits(10) == 0) // nothing old enough
    val removed = tbl.cleanRetainCommits(2)
    assert(removed > 0)
    // the latest 2 snapshots still read fully
    assert(tbl.readAsOf(instants(2)).count() == orders.count())
    assert(tbl.read().count() == orders.count())
    // the first snapshot lost its replaced files
    assertThrows[Exception](tbl.readAsOf(instants.head).count())
  }

  test("timeline checkpoint + archive bound hot-timeline size, reads unchanged") {
    val tbl = freshTable("timeline_cp")
    tbl.insert(orders, numFiles = 4)
    (1 to 5).foreach { m =>
      tbl.upsert(orders.filter(col("o_orderkey") % 50 === m)
        .withColumn("o_orderstatus", lit(s"S$m")))
    }
    val expect = tbl.read().orderBy("o_orderkey").collect()

    val cp = tbl.checkpointTimeline()
    // every commit BEFORE the checkpoint left the hot dir; the HEAD
    // commit stays hot so latestInstant()/stream offsets never regress
    // (archiving it made consumers stop short of the real head forever —
    // StreamReplaySpec seed-sweep-found)
    assert(tbl.timeline.instants() == Seq(cp))
    assert(tbl.timeline.archivedInstants().size == 5)
    // a FRESH handle (cold caches) resolves the same snapshot from the
    // checkpoint alone
    val fresh = GraftTable(spark, tbl.cfg)
    assert(fresh.read().orderBy("o_orderkey").collect().sameElements(expect))

    // new commits replay on top of the checkpoint
    val i7 = fresh.upsert(orders.filter(col("o_orderkey") % 50 === 7)
      .withColumn("o_orderstatus", lit("S7")))
    assert(fresh.timeline.instants() == Seq(cp, i7))
    assert(fresh.read().filter(col("o_orderstatus") === "S7").count() ==
      orders.filter(col("o_orderkey") % 50 === 7).count())
    // instant numbers are never reused after archive
    assert(i7.toLong > cp.toLong)
    // time travel into the archived replay range refuses (no wrong answers)
    assertThrows[IllegalArgumentException](fresh.readAsOf(Timeline.pad(3)).count())
    // history still sees the archived commits
    assert(fresh.history().count() == 7)
  }

  test("concurrent writers on disjoint keys: both commit, no lost updates") {
    val tbl = freshTable("concurrent_disjoint")
    tbl.insert(orders, numFiles = 8)
    val n = orders.count()
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: String, m: Int): Runnable = () => {
      try {
        start.await()
        // a separate handle per thread, like two independent jobs
        val h = GraftTable(spark, tbl.cfg)
        h.upsert(orders.filter(col("o_orderkey") % 2 === m)
          .withColumn("o_orderstatus", lit(tag)))
      } catch { case t: Throwable => errs.add(t) }
    }
    pool.submit(writer("E", 0))
    pool.submit(writer("D", 1))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    // Disjoint key sets may still collide on FILES (even/odd keys share
    // files) — then first-committer-wins aborts the loser. Accept either
    // a conflict abort (state = winner applied) or both committing; what
    // is NEVER acceptable is silent row loss or both tags half-applied.
    val fresh = GraftTable(spark, tbl.cfg)
    assert(fresh.read().count() == n, "rows lost or duplicated")
    val tags = fresh.read().select("o_orderstatus").distinct()
      .collect().map(_.getString(0)).toSet
    if (errs.isEmpty) assert(Set("E", "D").subsetOf(tags), s"both committed but tags=$tags")
    else {
      assert(errs.size == 1, s"at most one writer may lose: $errs")
      assert(errs.peek().getMessage.contains("write conflict"), errs.peek().getMessage)
      assert(tags.contains("E") || tags.contains("D"), s"winner's update lost: $tags")
    }
  }

  test("crash injection: writers interrupted at random points never corrupt the table") {
    // The concurrency matrix (lease retries, NBCC, async services, orphan
    // reaping) is tested piecewise elsewhere; this is the adversarial
    // composition: kill a writer at a SEEDED-RANDOM point mid-protocol,
    // then assert the commit contract held — every tagged wave is
    // all-or-nothing, no rows are ever lost or duplicated, the lock never
    // wedges (interrupt unwinds through the holder's finally), and the
    // reaper deletes the killed writers' half-written files without
    // touching live data.
    val tbl = freshTable("crash_inject")
    tbl.insert(orders, numFiles = 4)
    val n = orders.count()
    val rnd = new scala.util.Random(0xC0FFEE)
    val landed = scala.collection.mutable.Map.empty[String, Long]
    for (run <- 0 until 8) {
      val tag = s"K$run"
      val wave = orders.filter(col("o_orderkey") % 7 === run % 7)
        .withColumn("o_orderstatus", lit(tag))
      val expected = wave.count()
      val t = new Thread(() => {
        try GraftTable(spark, tbl.cfg).upsert(wave)
        catch { case _: Throwable => () } // a killed writer may throw anything
      }, s"crash-writer-$run")
      t.start()
      Thread.sleep(rnd.nextInt(1200).toLong) // randomized kill point
      t.interrupt()
      t.join(120000)
      assert(!t.isAlive, s"writer $run wedged after interrupt")
      // invariants, from a cache-cold handle (as the next job would see it)
      val fresh = GraftTable(spark, tbl.cfg)
      assert(fresh.read().count() == n, s"run $run: rows lost or duplicated")
      val c = fresh.read().filter(col("o_orderstatus") === tag).count()
      assert(c == 0L || c == expected,
        s"run $run: partial commit visible — $c of $expected '$tag' rows")
      landed(tag) = c
    }
    // the table is not wedged: a clean writer still commits normally
    val fin = GraftTable(spark, tbl.cfg)
    fin.upsert(orders.filter(col("o_orderkey") % 7 === 6)
      .withColumn("o_orderstatus", lit("FIN")))
    assert(fin.read().filter(col("o_orderstatus") === "FIN").count() ==
      orders.filter(col("o_orderkey") % 7 === 6).count())
    // reaper converges: half-written files from killed writers are
    // unreferenced and reapable; committed state is untouched by reaping
    val before = fin.read().groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fin.cleanOrphans(olderThanMs = 0L)
    val after = GraftTable(spark, tbl.cfg).read().groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, s"reaper changed visible state: $before -> $after")
    assert(after.values.sum == n)
  }

  test("concurrent MOR writers: delta appends never conflict, both commit") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/concurrent_mor", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    val n = orders.count()
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: String, m: Int): Runnable = () => {
      try {
        start.await()
        val h = GraftTable(spark, tbl.cfg)
        h.upsert(orders.filter(col("o_orderkey") % 2 === m)
          .withColumn("o_orderstatus", lit(tag)))
      } catch { case t: Throwable => errs.add(t) }
    }
    pool.submit(writer("E", 0))
    pool.submit(writer("D", 1))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    // MOR appends remove nothing, so first-committer-wins never fires:
    // BOTH writers must land, and resolution must see both tags
    assert(errs.isEmpty, s"MOR appends must not conflict: $errs")
    val fresh = GraftTable(spark, tbl.cfg)
    assert(fresh.read().count() == n)
    val tags = fresh.read().select("o_orderstatus").distinct()
      .collect().map(_.getString(0)).toSet
    assert(Set("E", "D").subsetOf(tags), s"lost a writer's rows: $tags")
  }

  test("secondary index prunes the file set for a non-key equality lookup") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/secondary_index", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    // range partitioning may merge a boundary: >= 4 of the 5 requested
    val live = tbl.timeline.liveFiles(None)
    assert(live.size >= 4)
    val pruned = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    // clustering localizes each of the 5 priorities; the index must map
    // 1-URGENT to a strict subset of the live files (liveness-filtering the
    // insert commit's stale mappings on the way)
    assert(pruned.nonEmpty && pruned.size < live.size,
      s"index mapped ${pruned.size} of ${live.size} files")
    val viaIndex = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val viaScan = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(viaIndex.sameElements(viaScan))
    // unindexed column falls back, still correct
    assert(tbl.secondaryIndexFiles("o_orderstatus", Seq("F")).isEmpty)
    // a value the index has never seen: empty result, not a read error
    assert(tbl.readBySecondary("o_orderpriority", Seq("9-NONE")).count() == 0)

    // SI COMPACTION: fold the per-commit dirs (insert + cluster = 2) into
    // one merged dir; the _covered manifest preserves the "which commits
    // are mapped" test, so pruning power and results are unchanged
    val siDir = new java.io.File(
      "/tmp/graft_spec/secondary_index/_graft/si/o_orderpriority")
    assert(siDir.listFiles().count(_.isDirectory) == 2)
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val dirs = siDir.listFiles().filter(_.isDirectory)
    assert(dirs.length == 1 && dirs(0).getName.startsWith("merged-"))
    val prunedAfter = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(prunedAfter.map(_.path).toSet == pruned.map(_.path).toSet,
      "compaction changed the pruned file set")
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect().sameElements(viaScan))
    // INCREMENTAL second round: a new commit lands, the fold consumes
    // {merged base} ∪ {new commit} — the base is adopted by rename
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderpriority", lit("1-URGENT")))
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val dirs2 = siDir.listFiles().filter(_.isDirectory)
    assert(dirs2.length == 1)
    // adopted base files live INSIDE the vb= value buckets (the merged dir
    // is hash-partitioned by value so equality lookups open one bucket)
    assert(dirs2(0).listFiles().filter(_.getName.startsWith("vb="))
      .flatMap(_.listFiles()).map(_.getName)
      .exists(n => n.startsWith("adopt-merged-") && n.endsWith(".parquet")),
      "no adopted base files after incremental SI compaction")
    assert(new java.io.File(dirs2(0), "_buckets").exists(),
      "merged SI dir must record its value-bucket count")
    val viaIndex2 = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val viaScan2 = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(viaIndex2.sameElements(viaScan2))
    assert(viaIndex2.exists(_.getAs[Long]("o_orderkey") == 7L))
    // and the index still PRUNES (coverage intact — nothing degraded to
    // scan-everything conservatism)
    val prunedInc = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(prunedInc.size < tbl.timeline.liveFiles(None).size)
  }

  test("secondary index on MOR never returns rows superseded by a delta") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/secondary_index_mor", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor, secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 2)
    // a delta moves one urgent key OUT of 1-URGENT; the index still maps
    // the base file (containing the stale row) to 1-URGENT
    val k = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey").head().getLong(0)
    val moved = orders.filter(col("o_orderkey") === k)
      .withColumn("o_orderpriority", lit("9-MOVED"))
    tbl.upsert(moved)
    val urgent = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
    assert(urgent.filter(col("o_orderkey") === k).count() == 0,
      "stale base row leaked through the secondary index")
    val viaScan = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
    assert(urgent.count() == viaScan.count())
    // and the delta's new value IS findable
    assert(tbl.readBySecondary("o_orderpriority", Seq("9-MOVED"))
      .filter(col("o_orderkey") === k).count() == 1)
  }

  test("rebuildSecondaryIndex re-derives the index from data and heals coverage") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/si_rebuild", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val siDir = new java.io.File(
      "/tmp/graft_spec/si_rebuild/_graft/si/o_orderpriority")
    val merged = siDir.listFiles().filter(_.isDirectory).head
    // simulate a pre-manifest legacy merged dir: no _covered manifest —
    // every live file must scan (conservative), and stay that way through
    // incremental folds (the union rule can only carry claims forward)
    assert(new java.io.File(merged, "_covered").delete())
    val live = tbl.timeline.liveFiles(None)
    val legacy = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(legacy.size == live.size,
      s"manifest-less merged dir must be fully conservative: ${legacy.size} of ${live.size}")
    // rebuild from the live data: ONE merged dir, coverage healed exactly,
    // pruning power restored, results identical to a scan
    assert(tbl.rebuildSecondaryIndex("o_orderpriority") == 1)
    val dirs = siDir.listFiles().filter(_.isDirectory)
    assert(dirs.length == 1 && dirs(0).getName.startsWith("merged-"))
    assert(new java.io.File(dirs(0), "_covered").exists())
    val pruned = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(pruned.nonEmpty && pruned.size < live.size,
      s"rebuild must restore pruning: ${pruned.size} of ${live.size}")
    val viaIndex = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val viaScan = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(viaIndex.sameElements(viaScan))
  }

  test("rebuildSecondaryIndex backfills a column indexed after the data existed") {
    val base = GraftTableConfig(
      "/tmp/graft_spec/si_backfill", "o_orderkey", "o_orderkey")
    val t0 = GraftTable(spark, base)
    t0.dropIfExists()
    t0.insert(orders, numFiles = 4)
    t0.cluster(Seq("o_orderpriority"), numFiles = 5)
    // enable the index on an existing table: zero index dirs → lookups
    // decline (None, full scan) until a rebuild backfills the history
    val tbl = GraftTable(spark,
      base.copy(secondaryIndexCols = Seq("o_orderpriority")))
    assert(tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).isEmpty)
    assert(tbl.rebuildSecondaryIndex("o_orderpriority") == 0)
    val live = tbl.timeline.liveFiles(None)
    val pruned = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(pruned.nonEmpty && pruned.size < live.size,
      s"backfill must index the whole history: ${pruned.size} of ${live.size}")
    val viaIndex = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val viaScan = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(viaIndex.sameElements(viaScan))
  }

  test("secondary index refuses unstable-string types and falls back to a scan") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/secondary_index_ts", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderdate", "o_totalprice")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 2)
    // timestamp/double string forms differ between the indexed cast and
    // String.valueOf — the lookup must DECLINE (None), not return empty
    val someDate = orders.head().getAs[java.time.LocalDateTime]("o_orderdate")
    assert(tbl.secondaryIndexFiles("o_orderdate", Seq(someDate)).isEmpty)
    assert(tbl.secondaryIndexFiles("o_totalprice", Seq(1.5d)).isEmpty)
    val viaApi = tbl.readBySecondary("o_orderdate", Seq(someDate)).count()
    val viaScan = tbl.read().filter(col("o_orderdate") === someDate).count()
    assert(viaApi == viaScan && viaScan > 0)
  }

  test("rebucket doubles the bucket layout; lookups prune under the new modulus") {
    val tbl = freshTable("rebucket", numBuckets = 4)
    tbl.insert(orders, numFiles = 1)
    val n = orders.count()
    tbl.rebucket(8)
    // persisted config carries the new count; a fresh handle uses it
    val fresh = GraftTable(spark, TableProperties.load(spark, tbl.cfg.path).get)
    assert(fresh.cfg.numBuckets == 8)
    val live = fresh.timeline.liveFiles(None)
    assert(live.map(_.bucket).distinct.size == 8)
    assert(live.forall(_.bucketMod == 8))
    assert(fresh.read().count() == n)
    // point lookup scans only the key's bucket (plus range check)
    val files = fresh.lookupFiles(Seq(42L))
    assert(files.size < live.size, s"lookup scanned ${files.size} of ${live.size}")
    assert(fresh.pointLookup(Seq(42L)).count() == 1)
    // a STALE handle (old modulus) must stay correct: bucket pruning is
    // disabled for mismatched bucketMod, not wrong
    assert(tbl.pointLookup(Seq(42L)).count() == 1)
    assert(tbl.read().count() == n)
  }

  test("incremental bucket split: hot bucket rewrites locally, rest untouched") {
    val tbl = freshTable("bucket_split", numBuckets = 4)
    tbl.insert(orders, numFiles = 1)
    val n = orders.count()
    val before = tbl.timeline.liveFiles(None)
    assert(before.map(_.bucket).distinct.size == 4)
    val untouchedPaths = before.filter(_.bucket != 2).map(_.path).toSet

    tbl.splitBucket(2)
    val mid = tbl.timeline.liveFiles(None)
    // only bucket 2's files were replaced; the split halves carry mod 8
    assert(untouchedPaths.subsetOf(mid.map(_.path).toSet))
    assert(mid.filter(_.bucketMod == 8).map(_.bucket).toSet == Set(2, 6))
    // mixed-modulus state reads correctly, point lookups stay correct
    assert(tbl.read().count() == n)
    assert(tbl.pointLookup(Seq(42L)).count() == 1)
    // finalize refuses while unsplit buckets remain
    assert(!tbl.finalizeBucketSplit())
    // a second split of the same bucket under the old modulus refuses
    assertThrows[IllegalArgumentException](tbl.splitBucket(2))

    Seq(0, 1, 3).foreach(tbl.splitBucket)
    assert(tbl.finalizeBucketSplit())
    val fresh = GraftTable(spark, TableProperties.load(spark, tbl.cfg.path).get)
    assert(fresh.cfg.numBuckets == 8)
    assert(fresh.read().count() == n)
    // fully-split table prunes lookups under the new modulus again
    val live = fresh.timeline.liveFiles(None)
    assert(fresh.lookupFiles(Seq(42L)).size < live.size)
  }

  test("split planner targets only overloaded buckets (FindBucketNumber analogue)") {
    val tbl = freshTable("split_planner", numBuckets = 4)
    tbl.insert(orders, numFiles = 1)
    // overload ONE bucket with fresh keys that hash into it
    val hot = spark.range(2000000L, 2200000L).toDF("o_orderkey")
      .filter(pmod(xxhash64(col("o_orderkey")), lit(4)) === 2)
      .limit(1200)
      .withColumn("o_custkey", lit(1L))
      .withColumn("o_orderstatus", lit("H"))
      .withColumn("o_totalprice", lit(1.0))
      .withColumn("o_orderdate", lit("1997-01-01").cast("timestamp"))
      .withColumn("o_orderpriority", lit("3-MEDIUM"))
    tbl.upsert(hot)
    val n = tbl.read().count()
    val split = TableServices.maybeSplitBuckets(tbl, splitThreshold = 1.5)
    assert(split == Seq(2), s"expected only bucket 2 split, got $split")
    val live = tbl.timeline.liveFiles(None)
    assert(live.filter(_.bucketMod == 8).map(_.bucket).toSet == Set(2, 6))
    assert(tbl.read().count() == n)
    // a second planner pass is a no-op: bucket 2 is no longer under mod 4
    assert(TableServices.maybeSplitBuckets(tbl, splitThreshold = 1.5).isEmpty)
  }

  test("partial upsert patches only non-null fields and inserts new keys whole") {
    val tbl = freshTable("partial_upsert")
    tbl.insert(orders, numFiles = 2)
    val patch = orders.filter(col("o_orderkey") === 1L).select(
      col("o_orderkey"),
      lit(null).cast("bigint").as("o_custkey"),
      lit(null).cast("string").as("o_orderstatus"),
      lit(9999.5).as("o_totalprice"),
      lit(null).cast("timestamp").as("o_orderdate"),
      lit(null).cast("string").as("o_orderpriority"))
      .unionByName(orders.filter(col("o_orderkey") === 2L)
        .withColumn("o_orderkey", lit(77777777L)))
    tbl.partialUpsert(patch)
    val r1 = tbl.read().filter(col("o_orderkey") === 1L).head()
    val orig = orders.filter(col("o_orderkey") === 1L).head()
    assert(r1.getAs[Double]("o_totalprice") == 9999.5)
    assert(r1.getAs[Long]("o_custkey") == orig.getAs[Long]("o_custkey"))
    assert(r1.getAs[String]("o_orderstatus") == orig.getAs[String]("o_orderstatus"))
    assert(tbl.read().filter(col("o_orderkey") === 77777777L).count() == 1)
  }

  test("orphan reaper deletes only unreferenced, aged data files") {
    val tbl = freshTable("orphans")
    tbl.insert(orders, numFiles = 2)
    val n = tbl.read().count()
    // simulate a hard-killed writer: a data dir with no commit
    val junkDir = new java.io.File("/tmp/graft_spec/orphans/data/000000099")
    junkDir.mkdirs()
    val junk = new java.io.File(junkDir, "part-junk.parquet")
    assert(junk.createNewFile())
    // too fresh: grace period protects a possibly-live write
    assert(tbl.cleanOrphans(olderThanMs = 60000L) == 0)
    assert(junk.exists())
    assert(junk.setLastModified(System.currentTimeMillis() - 120000L))
    assert(tbl.cleanOrphans(olderThanMs = 60000L) == 1)
    assert(!junk.exists())
    // committed files untouched, table intact
    assert(tbl.read().count() == n)
    // replaced files are NOT orphans (clean()'s job)
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")))
    assert(tbl.cleanOrphans(olderThanMs = 0L) == 0)
  }

  test("commit file-lock: released after commit; stale lease is broken") {
    val tbl = freshTable("commit_lock")
    tbl.insert(orders.limit(100), numFiles = 1)
    val meta = new java.io.File("/tmp/graft_spec/commit_lock/_graft")
    assert(!meta.listFiles().exists(_.getName == ".commit.lock"))
    // a crashed writer's lock (older than the lease) must not block commits
    val stale = new java.io.File(meta, ".commit.lock")
    assert(stale.createNewFile())
    assert(stale.setLastModified(System.currentTimeMillis() - 10 * 60 * 1000))
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", lit("L")))
    assert(!meta.listFiles().exists(_.getName == ".commit.lock"))
    assert(tbl.read().filter(col("o_orderstatus") === "L").count() == 10)
  }

  test("column stats skip files on a clustered range read") {
    val events = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/col_stats", "event_id", "event_id",
      statsCols = Seq("value", "event_type")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 8)
    tbl.cluster(Seq("value"), numFiles = 8)

    val all = tbl.timeline.liveFiles(None)
    assert(all.forall(_.colStats.contains("value"))) // harvested on rewrite too
    val pruned = tbl.filesBetween("value", 50.0, 60.0)
    assert(pruned.size < all.size, s"expected pruning: ${pruned.size} of ${all.size}")
    // string stats work the same way
    assert(tbl.filesBetween("event_type", "zzz1", "zzz2").isEmpty)

    // pruned read == unpruned filter
    val got = tbl.readBetween("value", 50.0, 60.0).orderBy("event_id").collect()
    val want = tbl.read().filter(col("value").between(50.0, 60.0))
      .orderBy("event_id").collect()
    assert(got.sameElements(want))
    // a column with no stats never prunes
    assert(tbl.filesBetween("user_id", 0, 1).size == all.size)
  }

  test("partition TTL: freshness-based expiry retires only cold partitions") {
    val tbl = freshTable("ttl_fresh", keyGen = FieldPartition("o_orderpriority"))
    // commit 1: two cold partitions; commit 2 touches one of them + a new one
    val cold = orders.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    val i1 = tbl.insert(cold, numFiles = 1)
    tbl.upsert(orders.filter(col("o_orderpriority").isin("2-HIGH", "3-MEDIUM")))
    val cutoff = tbl.timeline.instants().last // strictly-older-than-latest

    val dropped = TableServices.expirePartitionsLastModifiedBefore(tbl, cutoff)
    assert(dropped == Seq("o_orderpriority=1-URGENT")) // 2-HIGH was re-touched
    assert(tbl.read().filter(col("o_orderpriority") === "1-URGENT").isEmpty)
    assert(tbl.read().filter(col("o_orderpriority") === "2-HIGH").count() ==
      orders.filter(col("o_orderpriority") === "2-HIGH").count())

    // metadata-only: the retired partition's files still exist for time travel
    val removedPaths = tbl.timeline.readCommit(tbl.timeline.instants().last).removes
    assert(removedPaths.nonEmpty && removedPaths.forall(p =>
      new java.io.File(s"/tmp/graft_spec/ttl_fresh/$p").exists()))
    assert(tbl.readAsOf(i1).filter(col("o_orderpriority") === "1-URGENT").count() > 0)
    // idempotent: nothing left to expire at the same cutoff
    assert(TableServices.expirePartitionsLastModifiedBefore(tbl, cutoff).isEmpty)
  }

  test("pre-commit validator vetoes bad commits atomically; services exempt") {
    val tbl = freshTable("precommit")
    tbl.insert(orders, numFiles = 4)
    tbl.addPreCommitValidator("no_neg",
      "SELECT 1 FROM graft_candidate WHERE o_totalprice < 0 LIMIT 1")

    val want = tbl.read().orderBy("o_orderkey").collect()
    val instantsBefore = tbl.timeline.instants()
    val bad = orders.limit(50).withColumn("o_totalprice", col("o_totalprice") * -1)
    intercept[IllegalStateException](tbl.upsert(bad))

    // the veto is atomic: no new commit, no inflight marker, no orphan data
    assert(tbl.timeline.instants() == instantsBefore)
    val meta = new java.io.File("/tmp/graft_spec/precommit/_graft")
    assert(!meta.listFiles().exists(_.getName.endsWith(".inflight")))
    assert(tbl.read().orderBy("o_orderkey").collect().sameElements(want))

    // a DELETE that would violate nothing still passes; compaction (layout
    // service) is exempt even while the validator is registered
    tbl.delete(col("o_orderkey") % 97 === 0)
    tbl.compact(targetRows = 10000000L)
    assert(tbl.read().filter(col("o_totalprice") < 0).isEmpty)

    // a handle created BEFORE the validator was registered still enforces
    // it (validators are re-read per commit, never cached stale)
    val early = GraftTable(spark, tbl.cfg)
    intercept[IllegalStateException](early.upsert(bad))

    // dropping the validator re-admits the batch
    tbl.dropPreCommitValidator("no_neg")
    tbl.upsert(bad)
    assert(tbl.read().filter(col("o_totalprice") < 0).count() == 50)
  }

  test("pre-commit validator sees the RESOLVED candidate on MOR tables") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/precommit_mor", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 2)
    // rule: a key must never appear twice in the candidate snapshot — only a
    // RESOLVED view satisfies this once deltas exist
    tbl.addPreCommitValidator("unique_keys",
      """SELECT o_orderkey FROM graft_candidate
        |GROUP BY o_orderkey HAVING count(*) > 1 LIMIT 1""".stripMargin)
    // a delta over existing keys resolves to one row per key: passes
    tbl.upsert(orders.limit(100).withColumn("o_orderstatus", lit("U")))
    assert(tbl.read().filter(col("o_orderstatus") === "U").count() == 100)
    // MOR tombstone delete also passes (deleted keys leave the candidate)
    tbl.delete(col("o_orderkey") % 97 === 0)
    assert(tbl.read().filter(col("o_orderkey") % 97 === 0).isEmpty)
  }

  test("expression index prunes on derived values; new files kept until refresh") {
    val tbl = freshTable("expr_index")
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderdate"), numFiles = 12)
    tbl.createExpressionIndex("m", "date_trunc('MONTH', o_orderdate)")

    // date_trunc is monotonic in the clustering order: one calendar month
    // must prune almost everything
    val all = tbl.timeline.liveFiles(None)
    val (mLo, mHi) = ("1996-03-01 00:00:00", "1996-03-01 00:00:00")
    val pruned = tbl.exprIndexFiles("m", mLo, mHi)
    assert(pruned.size <= 3,
      s"expected expression pruning: ${pruned.size} of ${all.size}")

    // pruned read == unpruned filter
    def want = tbl.read()
      .filter(date_trunc("MONTH", col("o_orderdate")) === lit("1996-03-01 00:00:00"))
      .orderBy("o_orderkey").collect()
    assert(tbl.readExprBetween("m", mLo, mHi).orderBy("o_orderkey").collect()
      .sameElements(want))

    // an upsert writes files the index doesn't cover: they are KEPT (never
    // wrongly pruned) so the read stays correct...
    val i2 = tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")))
    val added = tbl.timeline.readCommit(i2).adds.map(_.path).toSet
    assert(tbl.exprIndexFiles("m", mLo, mHi).map(_.path).toSet.intersect(added) == added)
    assert(tbl.readExprBetween("m", mLo, mHi).orderBy("o_orderkey").collect()
      .sameElements(want))

    // ...and an incremental refresh covers exactly the new files, after
    // which dead entries are gone and pruning tightens again
    assert(tbl.refreshExpressionIndex("m") == added.size)
    assert(tbl.refreshExpressionIndex("m") == 0) // idempotent
    assert(tbl.readExprBetween("m", mLo, mHi).orderBy("o_orderkey").collect()
      .sameElements(want))

    // a NON-monotonic expression (month wraps at year boundaries) still
    // reads exactly right — wide per-file ranges keep files, never drop them
    tbl.createExpressionIndex("mm", "month(o_orderdate)")
    assert(tbl.readExprBetween("mm", 3, 3).count() ==
      tbl.read().filter(month(col("o_orderdate")) === 3).count())

    // a lex-kind expression index also answers string ranges
    tbl.createExpressionIndex("pfx", "substring(o_orderpriority, 1, 1)")
    assert(tbl.exprIndexFiles("pfx", "9", "9").isEmpty ||
      tbl.readExprBetween("pfx", "9", "9").count() == 0)
  }

  test("expr index refresh rewrites only the buckets with new or dead entries") {
    val tbl = freshTable("expr_shard")
    tbl.insert(orders, numFiles = 8)
    // explicit non-derived count: at 8 files the derived count is 1, which
    // would make the untouched-bucket pins below vacuous
    tbl.createExpressionIndex("m", "month(o_orderdate)", buckets = 16)
    val dir = new org.apache.hadoop.fs.Path(s"${tbl.cfg.path}/_graft/exprindex/m")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // signature of every index parquet file: bucket -> (name, mtime, len)
    def snapshot(): Map[String, (Long, Long)] = {
      val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          out(st.getPath.toString.split("/exprindex/m/")(1)) =
            (st.getModificationTime, st.getLen)
      }
      out.toMap
    }
    def bucketOf(rel: String): String = rel.split("/")(0)
    val before = snapshot()
    assert(before.nonEmpty)
    // a pure insert of NEW keys adds a couple of files (no dead entries):
    // only the buckets those paths hash to may be rewritten
    tbl.insert(orders.limit(200)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L), numFiles = 2)
    assert(tbl.refreshExpressionIndex("m") == 2)
    val after = snapshot()
    val changed = (before.keySet ++ after.keySet)
      .filter(p => before.get(p) != after.get(p)).map(bucketOf)
    assert(changed.size <= 2, s"refresh touched buckets $changed for 2 new files")
    // every file in an untouched bucket is byte-for-byte the same object
    before.foreach { case (p, sig) =>
      if (!changed(bucketOf(p)))
        assert(after.get(p).contains(sig), s"unaffected bucket file $p rewritten")
    }
    // and the refreshed index still answers correctly
    assert(tbl.readExprBetween("m", 3, 3).count() ==
      tbl.read().filter(month(col("o_orderdate")) === 3).count())
  }

  test("expr index bucket count: derived at create, frozen in meta, 16 when absent") {
    val tbl = freshTable("expr_buckets")
    tbl.insert(orders, numFiles = 6)
    val fs = new org.apache.hadoop.fs.Path(tbl.cfg.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketDirs(name: String): Set[String] = {
      val dir = new org.apache.hadoop.fs.Path(
        s"${tbl.cfg.path}/_graft/exprindex/$name")
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    // 6 entries derive 1 bucket (~64k entries per shard), not 16 near-empty dirs
    tbl.createExpressionIndex("derived", "month(o_orderdate)")
    assert(bucketDirs("derived") == Set("b=0"))
    // a non-default explicit count shards into exactly that many dirs and
    // the refresh respects it (entries land in buckets the meta recorded)
    tbl.createExpressionIndex("wide", "month(o_orderdate)", buckets = 4)
    assert(bucketDirs("wide").subsetOf(Set("b=0", "b=1", "b=2", "b=3")) &&
      bucketDirs("wide").size > 1)
    tbl.insert(orders.limit(100)
      .withColumn("o_orderkey", col("o_orderkey") + 20000000L), numFiles = 1)
    assert(tbl.refreshExpressionIndex("wide") == 1)
    assert(bucketDirs("wide").subsetOf(Set("b=0", "b=1", "b=2", "b=3")))
    assert(tbl.readExprBetween("wide", 3, 3).count() ==
      tbl.read().filter(month(col("o_orderdate")) === 3).count())
    // migration safety: a meta file written before the knob existed (no
    // "buckets" field) reads as the 16 it was sharded with
    val metaPath = new org.apache.hadoop.fs.Path(
      s"${tbl.cfg.path}/_graft/exprindex/wide.meta.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val in = fs.open(metaPath)
    val node = try mapper.readTree(in)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    finally in.close()
    node.remove("buckets")
    val out = fs.create(metaPath, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    // refresh under the fallback count still answers correctly (existing
    // 4-bucket entries merge with fresh 16-hashed ones; lookups read ALL
    // buckets regardless of count, so correctness is hash-layout-free)
    tbl.insert(orders.limit(50)
      .withColumn("o_orderkey", col("o_orderkey") + 30000000L), numFiles = 1)
    assert(tbl.refreshExpressionIndex("wide") == 1)
    assert(tbl.readExprBetween("wide", 3, 3).count() ==
      tbl.read().filter(month(col("o_orderdate")) === 3).count())
  }

  test("stats harvesting is type-gated: decimals poisoned, date/ts prune correctly") {
    import spark.implicits._
    val rows = Seq(
      (1L, BigDecimal("12.34"), java.sql.Date.valueOf("2024-01-05"),
        java.sql.Timestamp.valueOf("2024-01-05 10:00:00")),
      (2L, BigDecimal("56.78"), java.sql.Date.valueOf("2024-06-05"),
        java.sql.Timestamp.valueOf("2024-06-05 10:00:00")),
      (3L, BigDecimal("90.12"), java.sql.Date.valueOf("2024-12-05"),
        java.sql.Timestamp.valueOf("2024-12-05 10:00:00")))
      .toDF("id", "amount", "d", "ts")
      .withColumn("amount", col("amount").cast("decimal(10,2)"))
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/typed_stats", "id", "id",
      statsCols = Seq("amount", "d", "ts")))
    tbl.dropIfExists()
    tbl.insert(rows, numFiles = 3)
    tbl.cluster(Seq("id"), numFiles = 3)
    val all = tbl.timeline.liveFiles(None)

    // DECIMAL footers store UNSCALED ints (12.34 → 1234): harvesting them
    // would prune files that DO match — they must be poisoned (kept always)
    assert(all.forall(f => !f.colStats.contains("amount")))
    assert(tbl.filesBetween("amount", 12.0, 13.0).size == all.size)

    // DATE and TIMESTAMP stats prune files that provably miss the range...
    val dPruned = tbl.filesBetween("d",
      java.sql.Date.valueOf("2024-05-01"), java.sql.Date.valueOf("2024-07-01"))
    assert(dPruned.size < all.size && dPruned.nonEmpty)
    val tsPruned = tbl.filesBetween("ts",
      java.sql.Timestamp.valueOf("2024-05-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-07-01 00:00:00"))
    assert(tsPruned.size < all.size && tsPruned.nonEmpty)
    // ...and the pruned read matches the unpruned filter
    val got = tbl.readBetween("d",
      java.sql.Date.valueOf("2024-05-01"), java.sql.Date.valueOf("2024-07-01"))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))

    // mismatched bound types never crash and never prune
    assert(tbl.filesBetween("d", 1, 2).size == all.size)
    assert(tbl.filesBetween("ts", "not-a-ts", "zzz").size == all.size)
  }

  test("MOR read-optimized view: base files only, converges after compact") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/mor_ro", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    val n = orders.count()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")))
    // RO sees the pre-upsert base: full count, no 'U' rows
    assert(tbl.readOptimized().count() == n)
    assert(tbl.readOptimized().filter(col("o_orderstatus") === "U").count() == 0)
    // snapshot sees the deltas
    assert(tbl.read().filter(col("o_orderstatus") === "U").count() > 0)
    // after compaction RO == snapshot
    tbl.compact(targetRows = 10000000L)
    assert(tbl.readOptimized().orderBy("o_orderkey").collect()
      .sameElements(tbl.read().orderBy("o_orderkey").collect()))
  }

  test("MOR: insert-insert key collisions in base files resolve latest-wins") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/mor_base_dup", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor))
    tbl.dropIfExists()
    val n = orders.count()
    tbl.insert(orders.withColumn("o_orderstatus", lit("A")), numFiles = 2)
    // second INSERT with fully overlapping keys: both copies live in base
    // files (no delta commit involved)
    tbl.insert(orders.withColumn("o_orderstatus", lit("B")), numFiles = 2)
    val snap = tbl.read()
    assert(snap.count() == n, "base-only duplicate keys must collapse")
    assert(snap.select("o_orderstatus").distinct().collect().map(_.getString(0)).toSeq == Seq("B"))
    // a delta on top still resolves correctly (full-resolve path)
    tbl.upsert(orders.limit(10).withColumn("o_orderstatus", lit("C")))
    assert(tbl.read().count() == n)
    assert(tbl.read().filter(col("o_orderstatus") === "C").count() == 10)
  }

  test("checkpointTimeline re-run with no new commits is an idempotent no-op") {
    val tbl = freshTable("cp_idempotent")
    tbl.insert(orders, numFiles = 2)
    val cp1 = tbl.checkpointTimeline()
    // the head commit stays hot (latestInstant/stream offsets must not
    // regress); nothing older exists, so nothing archived
    assert(tbl.timeline.instants() == Seq(cp1))
    // periodic maintenance re-runs with no new commits: same checkpoint back
    assert(tbl.checkpointTimeline() == cp1)
    assert(tbl.read().count() == orders.count())
  }

  test("archive pins the head commit hot; checkpointed instants refuse rollback") {
    val tbl = freshTable("cp_head")
    tbl.insert(orders, numFiles = 2)
    val i2 = tbl.upsert(orders.filter(col("o_orderkey") % 50 === 1)
      .withColumn("o_orderstatus", lit("H")))
    val cp = tbl.checkpointTimeline()
    assert(cp == i2)
    assert(tbl.timeline.instants().lastOption.contains(i2),
      "the head commit must never be archived")
    assert(tbl.timeline.headInstant().contains(i2))
    // the checkpoint PINS i2's full file listing — rolling back i2 would
    // delete files the checkpoint still lists (reads resolve from it):
    // refuse loudly instead of corrupting
    val ex = intercept[IllegalArgumentException](tbl.rollback(i2))
    assert(ex.getMessage.contains("checkpoint"), ex.getMessage)
    assert(tbl.read().count() == orders.count())
    // the NEXT commit rolls back normally
    val i3 = tbl.upsert(orders.filter(col("o_orderkey") % 50 === 2)
      .withColumn("o_orderstatus", lit("X")))
    tbl.rollback(i3)
    assert(tbl.read().filter(col("o_orderstatus") === "X").count() == 0)
    assert(tbl.read().count() == orders.count())
  }

  test("relativizeCol matches relativize on every input_file_name shape, no ScalaUDF") {
    import spark.implicits._
    val root = "/tmp/graft tables/t1"
    // realistic input_file_name() shapes: URIs are always percent-encoded
    val paths = Seq(
      "file:///tmp/graft%20tables/t1/p=1/part-000.parquet", // scheme + empty authority
      "file:/tmp/graft%20tables/t1/part-001.parquet",       // bare scheme
      "file:///tmp/graft%20tables/t1/part-0%2B2.parquet",   // literal-plus %2B under root
      "hdfs://host:9000/elsewhere/part-003.parquet",        // external, authority stripped
      "/tmp/graft tables/t1/part-004.parquet",              // no scheme at all
      "s3a://bucket/ext/part-005.parquet",                  // external object store
      "/tmp/graft tables/t1/part-100%.parquet")             // malformed escape: decode must NOT throw
    val df = paths.toDF("af")
      .select(col("af"), GraftTable.relativizeCol(col("af"), root).as("f"))
    assert(!df.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    paths.foreach { p =>
      assert(got(p) == GraftTable.relativize(p, root),
        s"$p: col=${got(p)} scala=${GraftTable.relativize(p, root)}")
    }
  }

  test("COW rewrites preserve key locality: narrow upserts keep hitting few files") {
    // without key-range rewrites, each upsert's random repartition mixes
    // carried rows across the key space; after a few dozen commits every
    // file spans the whole range and every upsert rewrites ~everything
    // (the 1000-commit aging stress measured 134-file rewrites for a
    // 150-row batch). Pin: after 20 narrow-range upserts on a clustered
    // table, a narrow upsert still replaces only a small file set.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/rewrite_locality", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 20)
    tbl.cluster(Seq("o_orderkey"), numFiles = 20)
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    val width = maxKey / 50 + 1
    def batch(i: Int) = {
      val lo = (i % 50).toLong * width
      orders.filter(col("o_orderkey") >= lo && col("o_orderkey") < lo + width)
        .withColumn("o_orderstatus", lit(s"S$i"))
    }
    (1 to 20).foreach(i => tbl.upsert(batch(i)))
    val last = tbl.upsert(batch(3))
    val replaced = tbl.timeline.readCommit(last).removes.size
    val liveN = tbl.timeline.liveFiles(None).size
    assert(replaced * 3 <= liveN,
      s"locality lost: upsert of 1/50th of the key space replaced " +
        s"$replaced of $liveN files")
    // and no fragmentation runaway: sizing rewrites purely by the current
    // rows-per-file average was a positive feedback loop (the aging stress
    // measured +43 files/commit by commit 200); with the floored target,
    // 21 upserts on a 20-file table must not balloon the file count
    assert(liveN <= 40, s"file-count runaway: $liveN live files after 21 upserts")
    // content stays exact through all the rewrites
    assert(tbl.read().count() == orders.count())
    tbl.dropIfExists()
  }

  test("data files carry adaptively-sized key blooms, not 1 MiB fixed filters") {
    // with only bloom.filter.enabled set, parquet sizes EVERY filter at
    // max.bytes (1 MiB) regardless of rows: the aging stress measured
    // 13-row files at ~1.05 MB (99.9% bloom) and 74 GB for a 15k-row
    // table's upsert history. Adaptive sizing must keep small files small.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/bloom_size", "o_orderkey", "o_orderkey"))
    tbl.dropIfExists()
    tbl.insert(orders.limit(200), numFiles = 2)
    val files = new java.io.File("/tmp/graft_spec/bloom_size/data")
      .listFiles().flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach(f => assert(f.length < 100 * 1024,
      s"${f.getName}: ${f.length} bytes for ~100 rows — fixed-size bloom is back"))
    // and the bloom still exists and prunes: a point lookup on a missing
    // key schedules no file reads
    assert(tbl.lookupFiles(Seq(999999999L)).isEmpty)
    assert(tbl.pointLookup(Seq(orders.head().getLong(0))).count() == 1)
    tbl.dropIfExists()
  }

  test("record index: exact file set per key, stale mappings liveness-filtered") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/record_index", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 6)
    // the index maps each key to exactly the files that contain it
    val hit = tbl.lookupFiles(Seq(42L))
    assert(hit.size == 1, s"expected exactly one mapped file, got ${hit.size}")
    val live = tbl.timeline.liveFiles(None)
    assert(hit.size < live.size)
    assert(tbl.pointLookup(Seq(42L)).count() == 1)

    // an upsert rewrites the file containing key 42; the OLD mapping now
    // points at a dead file and must be filtered, the NEW one found
    tbl.upsert(orders.filter(col("o_orderkey") === 42L)
      .withColumn("o_orderstatus", lit("R")))
    val hit2 = tbl.lookupFiles(Seq(42L))
    assert(hit2.size == 1)
    val livePaths = tbl.timeline.liveFiles(None).map(_.path).toSet
    assert(hit2.forall(f => livePaths.contains(f.path)))
    val row = tbl.pointLookup(Seq(42L)).collect()
    assert(row.length == 1 && row(0).getAs[String]("o_orderstatus") == "R")

    // a missing key maps to no files at all (no scan scheduled)
    assert(tbl.lookupFiles(Seq(999999999L)).isEmpty)
    // a rolled-back commit's index dies with it
    val i3 = tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("X")))
    tbl.rollback(i3)
    assert(!new java.io.File(s"/tmp/graft_spec/record_index/_graft/rli/$i3").exists())
    assert(tbl.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") != "X")

    // index compaction folds all per-commit dirs into one; lookups unchanged
    val rliDir = new java.io.File("/tmp/graft_spec/record_index/_graft/rli")
    assert(rliDir.listFiles().count(_.isDirectory) > 1)
    assert(tbl.compactRecordIndex() > 1)
    assert(rliDir.listFiles().count(_.isDirectory) == 1)
    assert(tbl.lookupFiles(Seq(42L)).size == 1)
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    // re-running with no new commits is a no-op
    assert(tbl.compactRecordIndex() == 0)
    // writes after compaction index normally
    tbl.upsert(orders.filter(col("o_orderkey") === 100L)
      .withColumn("o_orderstatus", lit("Z")))
    assert(tbl.pointLookup(Seq(100L)).collect()(0).getAs[String]("o_orderstatus") == "Z")

    // INCREMENTAL compaction: the fold's input set is exactly
    // {merged base} ∪ {new commits} — the base is adopted by RENAME
    // (its bucket files appear under the new merged dir with the adopt-
    // prefix, never re-read or re-shuffled), only the new commit's dir
    // is folded. Consumed dirs = base + 1 new commit = 2.
    assert(tbl.compactRecordIndex() == 2)
    val dirs2 = rliDir.listFiles().filter(_.isDirectory)
    assert(dirs2.length == 1 && dirs2(0).getName.startsWith("merged-"),
      dirs2.map(_.getName).mkString(","))
    def parquetNames(d: java.io.File): Seq[String] =
      d.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
        .map(_.getName).filter(_.endsWith(".parquet")).toSeq
    assert(parquetNames(dirs2(0)).exists(_.startsWith("adopt-merged-")),
      s"no adopted base files under ${dirs2(0)}")
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(tbl.pointLookup(Seq(100L)).collect()(0).getAs[String]("o_orderstatus") == "Z")
    // a FULL fold re-reads everything, purging adopted (possibly-stale)
    // base files; lookups unchanged
    tbl.upsert(orders.filter(col("o_orderkey") === 200L)
      .withColumn("o_orderstatus", lit("F")))
    assert(tbl.compactRecordIndex(full = true) == 2)
    val dirs3 = rliDir.listFiles().filter(_.isDirectory)
    assert(dirs3.length == 1 && parquetNames(dirs3(0)).forall(!_.startsWith("adopt-")),
      "full fold must not carry adopted files forward")
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(tbl.pointLookup(Seq(200L)).collect()(0).getAs[String]("o_orderstatus") == "F")
  }

  test("a FULL record-index fold proves coverage back from the mappings (legacy heal)") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/rli_heal", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") === 42L)
      .withColumn("o_orderstatus", lit("R")))
    assert(tbl.compactRecordIndex() == 2)
    val rli = new java.io.File("/tmp/graft_spec/rli_heal/_graft/rli")
    val merged = rli.listFiles().filter(_.isDirectory).head
    // simulate a pre-manifest legacy merged dir: claims nothing, so every
    // live file is a permanent lookup candidate (correct but unpruned) —
    // and incremental folds can only carry that forward (union rule)
    assert(new java.io.File(merged, "_covered").delete())
    val live = tbl.timeline.liveFiles(None)
    assert(tbl.lookupFiles(Seq(42L)).size == live.size,
      "manifest-less merged dir must be fully conservative")
    assert(tbl.compactRecordIndex() == 0) // nothing new: no heal yet
    // a FULL fold re-reads every mapping, so it can PROVE coverage from
    // per-file mapping counts vs footer rows — the claim returns exactly
    val consumed = tbl.compactRecordIndex(full = true)
    assert(consumed == 1, s"full fold should consume the legacy dir, got $consumed")
    val hits = tbl.lookupFiles(Seq(42L))
    assert(hits.size == 1,
      s"full fold must heal coverage: ${hits.size} of ${live.size} files")
    assert(tbl.pointLookup(Seq(42L)).collect()(0)
      .getAs[String]("o_orderstatus") == "R")
  }

  test("index compaction crash leftovers: duplicate merged dirs stay correct and re-fold") {
    // the fold's crash order (write first, rename, delete last) can leave
    // an EXTRA merged dir holding duplicate mappings; lookups must stay
    // exact over the union and the next compaction must consume the
    // leftover rather than wedge
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/rli_crash", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") === 42L)
      .withColumn("o_orderstatus", lit("R")))
    assert(tbl.compactRecordIndex() == 2)
    val rli = new java.io.File("/tmp/graft_spec/rli_crash/_graft/rli")
    val merged = rli.listFiles().filter(_.isDirectory).head
    // simulate a crashed earlier fold: a second merged dir with the SAME
    // mappings under an older instant name
    def copyTree(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); src.listFiles().foreach(f =>
        copyTree(f, new java.io.File(dst, f.getName))) }
      else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    copyTree(merged, new java.io.File(rli, "merged-000000001"))
    // duplicate mappings are harmless: lookups take the distinct union
    assert(tbl.lookupFiles(Seq(42L)).size == 1)
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    // a new commit arrives; the next fold consumes BOTH merged dirs (the
    // real base adopted, the leftover adopted too) plus the new commit
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("X")))
    assert(tbl.compactRecordIndex() == 3)
    assert(rli.listFiles().count(_.isDirectory) == 1)
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(tbl.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") == "X")
    tbl.dropIfExists()
  }

  test("RLI fold crash at the SAME latest instant: leftover merged dir is recovered, not overwritten") {
    // the dangerous crash window: a fold targeting merged-<latest> finished
    // its adopt RENAMES (the leftover holds the ONLY copy of the previous
    // base's mappings) but died before delete-last. A re-run with no new
    // commits targets the SAME dir name — it must adopt the leftover, never
    // mode(overwrite) it.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/rli_crash_same", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") === 42L)
      .withColumn("o_orderstatus", lit("R")))
    assert(tbl.compactRecordIndex() == 2)
    val rli = new java.io.File("/tmp/graft_spec/rli_crash_same/_graft/rli")
    val base = rli.listFiles().filter(_.isDirectory).head
    // new commit, so the crashed run's target instant is newer than base's
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("X")))
    val latest = tbl.timeline.latestInstant().get
    // simulate the crashed run: adopt-renames from base into merged-<latest>
    // completed, base left as drained husk, per-commit dir + delete-last
    // never reached
    val leftover = new java.io.File(rli, s"merged-$latest")
    base.listFiles().filter(_.isDirectory).foreach { bucket =>
      val dst = new java.io.File(leftover, bucket.getName)
      dst.mkdirs()
      bucket.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        assert(f.renameTo(new java.io.File(dst, s"adopt-${base.getName}-${f.getName}")))
      }
    }
    // key 42's ONLY index mapping now lives inside the leftover; lookups
    // over the union stay exact even before the re-run
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    // re-run: consumes the drained husk + the new commit dir + the
    // recovered leftover (3 sources), and 42's mapping survives
    assert(tbl.compactRecordIndex() == 3)
    assert(rli.listFiles().count(_.isDirectory) == 1)
    assert(tbl.lookupFiles(Seq(42L)).nonEmpty, "crash recovery lost the adopted base mapping")
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(tbl.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") == "X")
    tbl.dropIfExists()
  }

  test("SI fold crash at the SAME latest instant: recovered leftover keeps results and coverage exact") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/si_crash_same", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    // clustering localizes each priority so the index has pruning power
    // to lose if recovery mishandles coverage
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val siDir = new java.io.File(
      "/tmp/graft_spec/si_crash_same/_graft/si/o_orderpriority")
    val base = siDir.listFiles().filter(_.isDirectory).head
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderpriority", lit("1-URGENT")))
    val latest = tbl.timeline.latestInstant().get
    // simulate the crashed run: fold output skipped (ok — the per-commit
    // dir survives), adopt renames done (nested, per vb= value bucket),
    // _buckets + _covered manifests written claiming BOTH instants,
    // delete-last never reached
    val leftover = new java.io.File(siDir, s"merged-$latest")
    leftover.mkdirs()
    base.listFiles().filter(_.getName.startsWith("vb=")).foreach { bucket =>
      val dst = new java.io.File(leftover, bucket.getName)
      dst.mkdirs()
      bucket.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        assert(f.renameTo(new java.io.File(dst, s"adopt-${base.getName}-${f.getName}")))
      }
    }
    java.nio.file.Files.copy(new java.io.File(base, "_buckets").toPath,
      new java.io.File(leftover, "_buckets").toPath)
    java.nio.file.Files.writeString(new java.io.File(leftover, "_covered").toPath,
      java.nio.file.Files.readString(new java.io.File(base, "_covered").toPath) + "\n" + latest)
    val expect = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    // re-run at the same latest instant: before the fix, mode(overwrite)
    // destroyed the adopted mappings while the rebuilt manifest still
    // claimed the insert instant was mapped -> silent mis-prune
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 3)
    assert(siDir.listFiles().count(_.isDirectory) == 1)
    val got = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(expect),
      s"SI crash recovery lost mappings: got ${got.length} rows, want ${expect.length}")
    // pruning power intact: the recovered coverage didn't degrade to scan-all
    val prunedCrash = tbl.secondaryIndexFiles("o_orderpriority", Seq("1-URGENT")).get
    assert(prunedCrash.size < tbl.timeline.liveFiles(None).size)
    tbl.dropIfExists()
  }

  test("RLI incremental fold auto-escalates to FULL once adopted dead weight crosses half") {
    // full-churn cycles: every upsert rewrites every file, so each adopted
    // base is 100% dead one cycle later. Without the bound, the merged dir
    // grows +15k mappings per cycle forever; with it, the fold escalates
    // the moment footer arithmetic proves majority-dead (base > 2x live)
    // and the dir snaps back to the live set.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/rli_deadweight", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    tbl.dropIfExists()
    val n = orders.count()
    tbl.insert(orders, numFiles = 4)
    def churn(tag: String): Unit = tbl.upsert(orders.withColumn("o_orderstatus", lit(tag)))
    val rli = new java.io.File("/tmp/graft_spec/rli_deadweight/_graft/rli")
    def mergedParquet(): Seq[String] = {
      val m = rli.listFiles().filter(_.isDirectory)
      assert(m.length == 1)
      m(0).listFiles().filter(_.isDirectory)
        .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".parquet")).toSeq
    }
    def mergedRows(): Long = spark.read.option("recursiveFileLookup", "true")
      .parquet(rli.listFiles().filter(_.isDirectory).head.getPath).count()
    churn("A"); assert(tbl.compactRecordIndex() == 2)       // base: 15k live
    churn("B"); assert(tbl.compactRecordIndex() == 2)       // adopt: 15k dead + 15k live
    assert(mergedParquet().exists(_.startsWith("adopt-")), "cycle 2 should still adopt")
    assert(mergedRows() == 2 * n)
    churn("C"); assert(tbl.compactRecordIndex() == 2)       // adopt: 30k dead + 15k live
    assert(mergedRows() == 3 * n)
    churn("D"); assert(tbl.compactRecordIndex() == 2)       // base 45k > 2x15k -> FULL
    assert(mergedParquet().forall(!_.startsWith("adopt-")),
      "dead-weight escalation did not purge the adopted base")
    assert(mergedRows() == n, s"expected $n live mappings after escalation")
    assert(tbl.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "D")
    tbl.dropIfExists()
  }

  test("SI incremental fold auto-escalates when the adopted base goes majority-dead") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/si_deadweight", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    // rewrite EVERY file (priorities unchanged): all base mappings dead
    tbl.upsert(orders.withColumn("o_orderstatus", lit("Z")))
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val siDir = new java.io.File(
      "/tmp/graft_spec/si_deadweight/_graft/si/o_orderpriority")
    val merged = siDir.listFiles().filter(_.isDirectory)
    assert(merged.length == 1)
    val names = merged(0).listFiles().filter(_.getName.startsWith("vb="))
      .flatMap(_.listFiles()).map(_.getName).filter(_.endsWith(".parquet"))
    assert(names.forall(!_.startsWith("adopt-")),
      "SI dead-weight escalation did not purge the dead base")
    val viaIndex = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val viaScan = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(viaIndex.sameElements(viaScan))
    tbl.dropIfExists()
  }

  test("multi-bucket SI: equality lookups open only the hashed vb= buckets, results exact") {
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/si_multibucket", "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.cluster(Seq("o_orderpriority"), numFiles = 5)
    // force a 7-bucket layout (auto-sizing folds a KB-scale test index to
    // one bucket, which would leave the multi-bucket read path untested)
    assert(tbl.compactSecondaryIndex("o_orderpriority", buckets = 7) == 2)
    val merged = new java.io.File(
      "/tmp/graft_spec/si_multibucket/_graft/si/o_orderpriority")
      .listFiles().filter(_.isDirectory).head
    val vbDirs = merged.listFiles().filter(_.getName.startsWith("vb=")).map(_.getName).toSet
    assert(vbDirs.size > 1, s"expected multiple value buckets, got $vbDirs")
    // the 5 priorities hash to their recorded buckets
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    prios.foreach { p =>
      assert(vbDirs.contains(s"vb=${tbl.siValueBucket(p, 7)}"),
        s"$p's bucket missing from $vbDirs")
      val viaIndex = tbl.readBySecondary("o_orderpriority", Seq(p))
        .orderBy("o_orderkey").collect()
      val viaScan = tbl.read().filter(col("o_orderpriority") === p)
        .orderBy("o_orderkey").collect()
      assert(viaIndex.sameElements(viaScan), s"bucketed lookup wrong for $p")
    }
    // multi-value lookup spanning buckets
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT", "5-LOW")).count() ==
      tbl.read().filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")).count())
    // a value hashing to a bucket with no dir: empty result, not an error
    val missing = (0 until 100).map(i => s"9-NONE-$i")
      .find(v => !vbDirs.contains(s"vb=${tbl.siValueBucket(v, 7)}"))
    missing.foreach { v =>
      assert(tbl.readBySecondary("o_orderpriority", Seq(v)).count() == 0)
    }
    // incremental fold ADOPTS the 7-bucket base (same B reused)
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderpriority", lit("1-URGENT")))
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    val merged2 = new java.io.File(
      "/tmp/graft_spec/si_multibucket/_graft/si/o_orderpriority")
      .listFiles().filter(_.isDirectory).head
    assert(merged2.listFiles().filter(_.getName.startsWith("vb="))
      .flatMap(_.listFiles()).exists(_.getName.startsWith("adopt-")),
      "same-B base was not adopted by rename")
    val got = tbl.readBySecondary("o_orderpriority", Seq("1-URGENT"))
      .orderBy("o_orderkey").collect()
    val want = tbl.read().filter(col("o_orderpriority") === "1-URGENT")
      .orderBy("o_orderkey").collect()
    assert(got.sameElements(want))
    // a DIFFERENT explicit B re-folds instead of adopting (bucket ids
    // must stay consistent within one merged dir)
    tbl.upsert(orders.filter(col("o_orderkey") === 11L)
      .withColumn("o_orderpriority", lit("5-LOW")))
    assert(tbl.compactSecondaryIndex("o_orderpriority", buckets = 3) == 2)
    val merged3 = new java.io.File(
      "/tmp/graft_spec/si_multibucket/_graft/si/o_orderpriority")
      .listFiles().filter(_.isDirectory).head
    assert(merged3.listFiles().filter(_.getName.startsWith("vb="))
      .flatMap(_.listFiles()).forall(!_.getName.startsWith("adopt-")),
      "mismatched-B base must be re-folded, not adopted")
    assert(tbl.readBySecondary("o_orderpriority", Seq("5-LOW")).count() ==
      tbl.read().filter(col("o_orderpriority") === "5-LOW").count())
    tbl.dropIfExists()
  }

  test("fold marker: RLI lookups fall back (exact) while a fold is in flight, resume after") {
    // a fold's adopt phase RENAMES mappings between two visible dirs — a
    // concurrent lookup can see the mapping in NEITHER. The `_folding`
    // marker spans every fold mutation; lookups that observe it must use
    // the non-index fallback (exact, just unpruned). Simulate the mid-
    // adopt state deterministically: marker present + a mapping hidden
    // from the index (its bucket dir renamed aside = "in flight").
    val root = "/tmp/graft_spec/fold_marker_rli"
    val tbl = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey", recordIndexBuckets = 4))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 6)
    assert(tbl.pointLookup(Seq(42L)).count() == 1)
    assert(tbl.lookupFiles(Seq(42L)).size == 1)

    val rli = new java.io.File(s"$root/_graft/rli")
    val instant = rli.listFiles().filter(_.isDirectory).head
    // mid-adopt snapshot: every bucket's mappings "in flight" (visible in
    // no probed dir), marker up — the exact state a lookup racing the
    // adopt renames can observe
    assert(new java.io.File(rli, "_folding").createNewFile())
    val buckets = instant.listFiles().filter(_.getName.startsWith("b="))
    buckets.foreach(b => assert(
      b.renameTo(new java.io.File(instant, s"inflight-${b.getName}"))))
    // the index now CANNOT answer — the marker must force the fallback,
    // which still finds the row (and still excludes missing keys)
    assert(tbl.pointLookup(Seq(42L)).count() == 1,
      "lookup trusted an index whose mappings are mid-rename")
    assert(tbl.pointLookup(Seq(999999999L)).count() == 0)
    // fold "completes": mappings land, marker clears — index path resumes
    buckets.foreach(b => assert(new java.io.File(instant,
      s"inflight-${b.getName}").renameTo(new java.io.File(instant, b.getName))))
    assert(new java.io.File(rli, "_folding").delete())
    assert(tbl.lookupFiles(Seq(42L)).size == 1)
    assert(tbl.pointLookup(Seq(42L)).count() == 1)

    // marker lifecycle around a REAL fold: set by the fold, cleared only
    // on success; a stale crash leftover is cleared by the next run
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("M")))
    assert(tbl.compactRecordIndex() >= 2)
    assert(!new java.io.File(rli, "_folding").exists(),
      "successful fold must clear its marker")
    assert(new java.io.File(rli, "_folding").createNewFile()) // "crashed fold"
    assert(tbl.compactRecordIndex() == 0) // no-op run: state stable
    assert(!new java.io.File(rli, "_folding").exists(),
      "no-op fold over stable state must clear a stale marker")
    assert(tbl.pointLookup(Seq(7L)).collect()(0)
      .getAs[String]("o_orderstatus") == "M")
    tbl.dropIfExists()
  }

  test("footer harvest: executor-job path yields stats identical to the driver pool") {
    // Above spark.graft.footerHarvest.driverMaxFiles the commit-time
    // footer harvest runs as a Spark job instead of driver threads — the
    // 100 TB path for bulk loads adding 1e5+ files, where even a pooled
    // driver loop is the commit's bottleneck. Two identical tables, one
    // per path (threshold forced to 1 file), must end with byte-identical
    // key ranges, row counts, buckets, and data-skipping column stats.
    val rootA = "/tmp/graft_spec/harvest_drv"
    val rootB = "/tmp/graft_spec/harvest_exec"
    def cfgFor(r: String) = GraftTableConfig(r, "o_orderkey", "o_orderkey",
      numBuckets = 4, statsCols = Seq("o_totalprice", "o_orderstatus"),
      recordIndexBuckets = 4)
    val ta = GraftTable(spark, cfgFor(rootA)); ta.dropIfExists()
    val tb = GraftTable(spark, cfgFor(rootB)); tb.dropIfExists()
    val patch = orders.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderstatus", lit("Z"))
    ta.insert(orders, numFiles = 3)
    ta.upsert(patch)
    spark.conf.set("spark.graft.footerHarvest.driverMaxFiles", "1")
    try {
      tb.insert(orders, numFiles = 3)
      tb.upsert(patch) // rewrite-path commits harvest through the job too
    } finally spark.conf.unset("spark.graft.footerHarvest.driverMaxFiles")
    def metas(t: GraftTable) = t.timeline.liveFiles(None)
      .map(m => (m.partition, m.bucket, m.bucketMod, m.minKey, m.maxKey,
        m.rows, m.colStats.toSeq.sortBy(_._1)))
      .sortBy(_.toString())
    assert(metas(ta) == metas(tb),
      "executor-harvested FileMetas must match the driver pool's exactly")
    // and the harvested stats must actually WORK: pruned lookups + reads
    assert(tb.pointLookup(Seq(26L)).count() == 1)
    assert(tb.read().count() == orders.count())
    assert(tb.read().filter(col("o_orderstatus") === "Z").count() == patch.count())
    ta.dropIfExists(); tb.dropIfExists()

    // PARTITIONED twin: the executor path must parse the hive-style
    // partition segments (and keep partition-pruned reads exact) the
    // same way the driver pool does — the `_gp_`/bucket segment parse is
    // shared code (fileMetaOf), but only a partitioned table exercises it
    val pa = GraftTable(spark, GraftTableConfig(s"${rootA}_p", "o_orderkey",
      "o_orderkey", keyGen = FieldPartition("o_orderpriority")))
    val pb = GraftTable(spark, GraftTableConfig(s"${rootB}_p", "o_orderkey",
      "o_orderkey", keyGen = FieldPartition("o_orderpriority")))
    pa.dropIfExists(); pb.dropIfExists()
    pa.insert(orders, numFiles = 2)
    spark.conf.set("spark.graft.footerHarvest.driverMaxFiles", "1")
    try pb.insert(orders, numFiles = 2)
    finally spark.conf.unset("spark.graft.footerHarvest.driverMaxFiles")
    assert(metas(pa) == metas(pb),
      "executor harvest must parse partition segments identically")
    assert(pa.timeline.liveFiles(None).map(_.partition).distinct.sorted ==
      orders.select("o_orderpriority").distinct().collect()
        .map(r => s"o_orderpriority=${r.getString(0)}").toSeq.sorted)
    val want1u = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(pb.read().filter(col("o_orderpriority") === "1-URGENT").count() == want1u)
    pa.dropIfExists(); pb.dropIfExists()
  }

  test("restore after compact+fold: resurrected files stay visible to indexed lookups") {
    // A fold liveness-purges merged-index mappings to files that are dead
    // AT FOLD TIME. restore/rollback can RESURRECT exactly those files
    // (undoing the compact that replaced them) — found by the model fuzz
    // as silently missing rows from SI equality (and the RLI had the same
    // hole without even a coverage manifest to repair). Contract: merged
    // dirs carry `_covered`; rollback un-claims resurrected instants;
    // lookups treat files of uncovered instants as always-candidates.
    val root = "/tmp/graft_spec/restore_fold"
    val tbl = GraftTable(spark, GraftTableConfig(root, "o_orderkey",
      "o_orderkey", recordIndexBuckets = 4,
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.savepoint(i1)
    // a second commit, then compact: the insert's base files die
    tbl.upsert(orders.limit(50).withColumn("o_orderstatus", lit("Z")))
    tbl.compact(targetRows = 1000000L)
    // folds built AFTER the compact purge the dead base files' mappings
    assert(tbl.compactRecordIndex() >= 1)
    assert(tbl.compactSecondaryIndex("o_orderpriority") >= 1)
    // restore resurrects the insert-time base files
    tbl.restore(i1)
    assert(tbl.read().count() == orders.count())
    // indexed lookups must still see every resurrected row
    assert(tbl.pointLookup(Seq(1L, 7L, 42L)).count() == 3,
      "RLI lookup lost resurrected rows after restore")
    val want = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() == want,
      "SI equality lost resurrected rows after restore")
    // and the table keeps working: further writes + folds stay exact
    tbl.upsert(orders.limit(20).withColumn("o_orderstatus", lit("W")))
    tbl.compactRecordIndex(); tbl.compactSecondaryIndex("o_orderpriority")
    assert(tbl.pointLookup(Seq(1L, 7L, 42L)).count() == 3)
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() == want)
    tbl.dropIfExists()
  }

  test("maintenance treats a stale fold marker as a trigger, below the dir threshold") {
    // A fold that crashes late (after delete-last, or on a read-mostly
    // table) can leave `_folding` with the dir count under maxDirs — the
    // NUM trigger alone would then never fire again, and every lookup
    // would pay the guard's rejected attempts + the unpruned fallback
    // forever. maybeCompactIndexes must fire on the marker itself.
    val root = "/tmp/graft_spec/marker_trigger"
    val tbl = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey", recordIndexBuckets = 4,
      secondaryIndexCols = Seq("o_orderstatus")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    val rli = new java.io.File(s"$root/_graft/rli")
    val si = new java.io.File(s"$root/_graft/si/o_orderstatus")
    assert(rli.listFiles().count(_.isDirectory) <= 20 &&
      si.listFiles().count(_.isDirectory) <= 20, "test wants sub-threshold dirs")
    // no marker, sub-threshold: maintenance is a no-op
    assert(TableServices.maybeCompactIndexes(tbl) == 0)
    // crashed-fold leftovers on both indexes
    assert(new java.io.File(rli, "_folding").createNewFile())
    assert(new java.io.File(si, "_folding").createNewFile())
    TableServices.maybeCompactIndexes(tbl)
    assert(!new java.io.File(rli, "_folding").exists(),
      "marker must trigger an RLI fold that clears it, below the dir threshold")
    assert(!new java.io.File(si, "_folding").exists(),
      "marker must trigger an SI fold that clears it, below the dir threshold")
    // index-pruned lookups resume (no marker → guard accepts first try)
    assert(tbl.pointLookup(Seq(42L)).count() == 1)
    tbl.dropIfExists()
  }

  test("fold marker: SI lookups fall back (exact) while a fold is in flight") {
    // the SI twin: with mappings mid-rename and no marker the lookup
    // would mis-prune (the merged dir's _covered manifest still claims
    // the commits) — under the marker it must scan unpruned instead
    val root = "/tmp/graft_spec/fold_marker_si"
    val tbl = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey",
      secondaryIndexCols = Seq("o_orderpriority")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") === 11L)
      .withColumn("o_orderpriority", lit("5-LOW")))
    assert(tbl.compactSecondaryIndex("o_orderpriority", buckets = 5) == 2)
    val siDir = new java.io.File(s"$root/_graft/si/o_orderpriority")
    assert(!new java.io.File(siDir, "_folding").exists())
    val want = tbl.read().filter(col("o_orderpriority") === "1-URGENT").count()
    assert(want > 0)
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() == want)

    // mid-adopt snapshot: vb= buckets renamed aside under the marker
    assert(new java.io.File(siDir, "_folding").createNewFile())
    val merged = siDir.listFiles().filter(_.isDirectory).head
    val vbs = merged.listFiles().filter(_.getName.startsWith("vb="))
    vbs.foreach(b => assert(
      b.renameTo(new java.io.File(merged, s"inflight-${b.getName}"))))
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() == want,
      "SI lookup mis-pruned against an index whose mappings are mid-rename")
    // fold "completes": buckets restored, marker cleared — pruning resumes
    vbs.foreach(b => assert(new java.io.File(merged,
      s"inflight-${b.getName}").renameTo(new java.io.File(merged, b.getName))))
    assert(new java.io.File(siDir, "_folding").delete())
    assert(tbl.readBySecondary("o_orderpriority", Seq("1-URGENT")).count() == want)
    // lifecycle around a real fold
    tbl.upsert(orders.filter(col("o_orderkey") === 13L)
      .withColumn("o_orderpriority", lit("5-LOW")))
    assert(tbl.compactSecondaryIndex("o_orderpriority") == 2)
    assert(!new java.io.File(siDir, "_folding").exists(),
      "successful SI fold must clear its marker")
    tbl.dropIfExists()
  }

  test("concurrent validator registrations: both survive the shared registry") {
    // same read-modify-write class as the schema union: two concurrent
    // addPreCommitValidator calls must not lose one registration
    val tbl = freshTable("validator_race")
    tbl.insert(orders.limit(100), numFiles = 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = Seq("no_nulls", "no_negatives").map { n =>
      new Thread(() => {
        try tbl.addPreCommitValidator(n,
          s"SELECT 1 WHERE false -- $n")
        catch { case t: Throwable => errs.add(t); () }
      }, s"validator-$n")
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"registration died: ${errs.peek()}")
    val registered = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/graft_spec/validator_race/_graft/validators.json")), "UTF-8")
    assert(registered.contains("no_nulls") && registered.contains("no_negatives"),
      s"a concurrent registration was lost: $registered")
    tbl.dropIfExists()
  }

  test("concurrent schema evolution: two writers' different new columns both survive") {
    // schema.json maintenance is a load-merge-save; unlocked, two writers
    // evolving DIFFERENT columns at once lose one column from the union
    // while its data files already carry it — readers then hide it
    // forever (readFiles reads with the explicit persisted schema). The
    // meta lock serializes the merge with other merges and with commits.
    val root = "/tmp/graft_spec/schema_race"
    def handle() = GraftTable(spark, GraftTableConfig(root, "o_orderkey", "o_orderkey"))
    val tbl = handle()
    tbl.dropIfExists()
    tbl.insert(orders.limit(200), numFiles = 2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = Seq("alpha", "beta").zipWithIndex.map { case (cName, i) =>
      new Thread(() => {
        try {
          val mine = handle()
          var attempts = 0
          var done = false
          while (!done) {
            try {
              // disjoint keys: the columns must coexist in the FINAL rows,
              // not just in whichever writer's version won a shared key
              mine.upsert(orders.filter(col("o_orderkey") % 2 === i).limit(50)
                .withColumn(s"extra_$cName", lit(i).cast("long")))
              done = true
            } catch {
              case _: CommitConflictException | _: LockTimeoutException
                  if attempts < 30 =>
                attempts += 1; Thread.sleep(50L)
            }
          }
        } catch { case t: Throwable => errs.add(t); () }
      }, s"schema-writer-$cName")
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"schema-evolving writer died: ${errs.peek()}")
    val cols = tbl.read().columns.toSet
    assert(cols.contains("extra_alpha") && cols.contains("extra_beta"),
      s"a concurrently-evolved column was lost from the union schema: $cols")
    // every file reads under the union: rows lacking a column get nulls
    assert(tbl.read().filter(col("extra_alpha").isNotNull).count() == 50)
    assert(tbl.read().filter(col("extra_beta").isNotNull).count() == 50)
    tbl.dropIfExists()
  }

  test("OCC storm: concurrent writers + reader + index folds, no lost or phantom rows") {
    // CI-sized ConcurrencyStress: 2 writers x 4 commits of globally
    // disjoint mod-101 slices on shared FILES (first-committer-wins +
    // retry exercised for real), a reader probing snapshot count and a
    // point lookup, and the index-fold trigger racing both. Guards the
    // four multi-writer bugs this shape found: instant-number reuse,
    // cache-substituted file attribution, folds eating in-flight index
    // dirs, and index/live snapshot tearing in lookups.
    val root = "/tmp/graft_spec/occ_storm"
    def handle() = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey", recordIndexBuckets = 4))
    val tbl = handle()
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 8)
    val n = orders.count()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val anomalies = new java.util.concurrent.atomic.AtomicInteger
    val writing = new java.util.concurrent.atomic.AtomicBoolean(true)
    val writers = (0 until 2).map { w =>
      new Thread(() => {
        try {
          val mine = handle()
          (0 until 4).foreach { c =>
            val b = orders.filter(col("o_orderkey") % 101 === (w * 4 + c))
              .withColumn("o_orderstatus", lit(s"W$w-C$c"))
            var attempts = 0
            var done = false
            while (!done) {
              try { mine.upsert(b); done = true }
              catch {
                case _: CommitConflictException | _: LockTimeoutException
                    if attempts < 60 =>
                  attempts += 1; Thread.sleep(50L)
              }
            }
          }
        } catch { case t: Throwable => errs.add(t); () }
      }, s"storm-writer-$w")
    }
    val reader = new Thread(() => {
      val mine = handle()
      while (writing.get()) {
        try {
          if (mine.read().count() != n) anomalies.incrementAndGet()
          if (mine.pointLookup(Seq(1L)).count() != 1) anomalies.incrementAndGet()
        } catch { case scala.util.control.NonFatal(_) => anomalies.incrementAndGet() }
        Thread.sleep(30L)
      }
    }, "storm-reader")
    val maintenance = new Thread(() => {
      val mine = handle()
      while (writing.get()) {
        try TableServices.maybeCompactIndexes(mine, 3)
        catch { case scala.util.control.NonFatal(_) => () } // transient, re-fires
        Thread.sleep(100L)
      }
    }, "storm-maintenance")
    reader.start(); maintenance.start()
    writers.foreach(_.start()); writers.foreach(_.join())
    writing.set(false); reader.join(); maintenance.join()
    assert(errs.isEmpty, s"writer died: ${errs.peek()}")
    assert(anomalies.get == 0, s"${anomalies.get} reader anomalies during the storm")
    val got = tbl.read()
    assert(got.count() == n, "row count drifted under concurrent writers")
    (0 until 2).foreach { w =>
      val slice = w * 4 + 3
      val want = orders.filter(col("o_orderkey") % 101 === slice).count()
      assert(got.filter(col("o_orderstatus") === s"W$w-C3").count() == want,
        s"lost update: writer $w's final slice")
    }
    tbl.dropIfExists()
  }

  test("index folds never consume an in-flight commit's index dir") {
    // index dirs land BEFORE their commit. A fold that lists a concurrent
    // writer's in-flight dir among its sources would liveness-drop every
    // one of its mappings (files not live yet) and then DELETE the dir —
    // the commit lands moments later with its keys permanently unindexed
    // (ConcurrencyStress measured point lookups losing exactly the rows
    // of commits that raced a fold trigger). Dirs of instants holding a
    // live .inflight reservation must be skipped, and consumed only after
    // the commit lands or the writer is fenced.
    val root = "/tmp/graft_spec/fold_inflight"
    val tbl = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey", recordIndexBuckets = 4))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("I")))
    // simulate a writer mid-commit: instant reserved, index dir written,
    // commit JSON not yet landed
    val i = tbl.timeline.reserveInstant()
    val rli = new java.io.File(s"$root/_graft/rli")
    val donorBucket = rli.listFiles().filter(_.isDirectory).head
      .listFiles().filter(_.getName.startsWith("b=")).head
    val inflightBucket = new java.io.File(rli, s"$i/${donorBucket.getName}")
    assert(inflightBucket.mkdirs())
    donorBucket.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(inflightBucket, f.getName).toPath)
    }
    // the fold consumes the 2 committed dirs and MUST leave the in-flight one
    assert(tbl.compactRecordIndex() == 2)
    assert(new java.io.File(rli, i).exists(),
      "fold consumed a live writer's in-flight index dir")
    assert(tbl.pointLookup(Seq(7L)).collect()(0)
      .getAs[String]("o_orderstatus") == "I")
    // once the writer is gone (fenced/aborted), the dir becomes a normal
    // fold source and is consumed
    tbl.timeline.abort(i)
    assert(tbl.compactRecordIndex() == 2) // merged base + the released dir
    assert(!new java.io.File(rli, i).exists())
    assert(tbl.pointLookup(Seq(7L)).collect()(0)
      .getAs[String]("o_orderstatus") == "I")
    tbl.dropIfExists()
  }

  test("concurrent fold calls serialize: one merged result, no marker left, exact lookups") {
    // the async service's thread and a direct compact call can race the
    // same index; the per-root JVM lock must serialize them (unlocked,
    // the first finisher would clear the marker while the second is
    // still renaming — and recoverLeftoverMerged would rename a fold's
    // IN-PROGRESS target out from under it)
    val root = "/tmp/graft_spec/fold_concurrent"
    val tbl = GraftTable(spark, GraftTableConfig(
      root, "o_orderkey", "o_orderkey", recordIndexBuckets = 4))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    (1 to 4).foreach(i => tbl.upsert(orders.filter(col("o_orderkey") === i.toLong)
      .withColumn("o_orderstatus", lit(s"C$i"))))
    // 5 commits = 5 RLI dirs; 4 threads race the fold
    val consumed = new java.util.concurrent.atomic.AtomicInteger
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 4).map(_ => new Thread(() =>
      try { consumed.addAndGet(tbl.compactRecordIndex()); () }
      catch { case t: Throwable => errs.add(t); () }))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent folds failed: ${errs.peek()}")
    assert(consumed.get == 5,
      s"exactly one racer must consume all 5 dirs (the rest no-op against " +
        s"its completed result), got ${consumed.get}")
    val rli = new java.io.File(s"$root/_graft/rli")
    assert(rli.listFiles().count(_.isDirectory) == 1)
    assert(!new java.io.File(rli, "_folding").exists())
    (1 to 4).foreach(i => assert(tbl.pointLookup(Seq(i.toLong)).collect()(0)
      .getAs[String]("o_orderstatus") == s"C$i"))
    // a lone completed merged dir is left in place by a re-run (its name
    // is not shuffled through recovered- aliases), and full=true still
    // re-folds it (the documented purge)
    val nameBefore = rli.listFiles().filter(_.isDirectory).head.getName
    assert(tbl.compactRecordIndex() == 0)
    assert(rli.listFiles().filter(_.isDirectory).head.getName == nameBefore)
    assert(tbl.compactRecordIndex(full = true) == 1)
    assert(tbl.pointLookup(Seq(1L)).collect()(0)
      .getAs[String]("o_orderstatus") == "C1")
    tbl.dropIfExists()
  }

  test("record index survives a handle whose recordIndexBuckets drifted from the writer's") {
    // each index dir self-describes its bucket count (_buckets manifest);
    // before that, a handle configured with a different count probed the
    // WRONG bucket and silently missed rows
    val path = "/tmp/graft_spec/rli_drift"
    val w = GraftTable(spark, GraftTableConfig(path, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8))
    w.dropIfExists()
    w.insert(orders, numFiles = 4)
    w.upsert(orders.filter(col("o_orderkey") === 42L)
      .withColumn("o_orderstatus", lit("R")))
    val r = GraftTable(spark, GraftTableConfig(path, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 4))
    assert(r.lookupFiles(Seq(42L)).size == 1,
      "drifted handle missed the key its config would mis-bucket")
    assert(r.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    // the drifted handle's own writes land under ITS count, self-described;
    // BOTH handles stay exact over the mixed-count dirs
    r.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("X")))
    assert(r.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") == "X")
    assert(w.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") == "X")
    // compaction under either handle re-folds everything into ONE layout
    // under its own count (mixed-count bases are never adopted), and both
    // handles keep reading it exactly via the manifest
    assert(r.compactRecordIndex() == 3)
    assert(r.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(w.pointLookup(Seq(42L)).collect()(0).getAs[String]("o_orderstatus") == "R")
    assert(w.pointLookup(Seq(7L)).collect()(0).getAs[String]("o_orderstatus") == "X")
    w.dropIfExists()
  }

  test("record-index tagging: uncovered instants fall back to the classic probe, exactly") {
    val path = "/tmp/graft_spec/rli_tag_fallback"
    val t = GraftTable(spark, GraftTableConfig(path, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 4))
    t.dropIfExists()
    // 12+ files: the batch's key span keeps enough candidates that the
    // probe takes the TAGGED path (the <8-candidate crossover gate skips
    // the index read for tiny probes)
    t.insert(orders, numFiles = 12)
    t.upsert(orders.filter(col("o_orderkey") === 7L)
      .withColumn("o_orderstatus", lit("S")))
    assert(t.compactRecordIndex() >= 1)
    val n = orders.count()
    // the batch's keys SPAN the key-clustered files so range pruning
    // keeps a tagging-sized candidate set; a tagging false-negative
    // would re-INSERT existing keys (count grows)
    val spread = col("o_orderkey") % 97 === 0
    t.upsert(orders.filter(spread).withColumn("o_orderstatus", lit("T")))
    assert(t.read().count() == n, "tagged upsert duplicated keys")
    assert(t.read().filter(spread)
      .filter(col("o_orderstatus") =!= "T").count() == 0)
    // strip the coverage manifest: every candidate of the folded instants
    // is now UNCOVERED — tagging must hand them to the classic probe,
    // result identical
    val merged = new java.io.File(s"$path/_graft/rli").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("merged-"))
    assert(merged.nonEmpty)
    merged.foreach(m => assert(new java.io.File(m, "_covered").delete()))
    t.upsert(orders.filter(spread).withColumn("o_orderstatus", lit("U")))
    assert(t.read().count() == n, "fallback probe duplicated keys")
    assert(t.read().filter(spread)
      .filter(col("o_orderstatus") =!= "U").count() == 0)
    // keyed delete rides the same tagging contract
    val doomed = orders.filter(spread)
    t.deleteByKeys(doomed)
    assert(t.read().count() == n - doomed.count())
    assert(t.read().filter(spread).count() == 0)
    t.dropIfExists()
  }

  test("siValueBucket: driver-local bucket ids match the engine's pmod(xxhash64(v), B)") {
    // the lookup computes its target vb= buckets WITHOUT a Spark job; the
    // local XxHash64 eval must agree with the engine expression the fold
    // writes with, or bucketed lookups silently miss
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/si_hash_parity", "o_orderkey", "o_orderkey"))
    val vals = Seq("1-URGENT", "", "a b c", "00042", "δοκιμή-ünïcødé", "x" * 500)
    for (b <- Seq(1, 7, 16, 256)) {
      val engine = spark.createDataFrame(
          spark.sparkContext.parallelize(vals.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
        .select(col("v"), pmod(xxhash64(col("v")), lit(b)).as("vb"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      vals.foreach(v => assert(tbl.siValueBucket(v, b) == engine(v),
        s"bucket mismatch for '$v' at B=$b"))
    }
  }

  test("prunedLiveFiles prunes by key range, partition path, and column stats") {
    val events = GraftSession.table(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/pruned_files", "event_id", "event_id",
      keyGen = TimestampDayPartition("ts", "p_day"),
      statsCols = Seq("value")))
    tbl.dropIfExists()
    tbl.insert(events, numFiles = 4)
    val all = tbl.timeline.liveFiles(None)

    // partition equality bound prunes to one day's files
    val oneDay = tbl.prunedLiveFiles(Seq(
      ColBound("p_day", Some("2024-01-05"), Some("2024-01-05"), Some(Seq("2024-01-05")))))
    assert(oneDay.nonEmpty && oneDay.size < all.size)
    assert(oneDay.forall(_.partition == "p_day=2024-01-05"))
    // partition range bound (string, lexical == chronological for ISO dates)
    val week = tbl.prunedLiveFiles(Seq(
      ColBound("p_day", Some("2024-01-05"), Some("2024-01-07"))))
    assert(week.forall(f => f.partition >= "p_day=2024-01-05" && f.partition <= "p_day=2024-01-07"))

    // key range bound prunes by per-file min/max key
    val lowKeys = tbl.prunedLiveFiles(Seq(ColBound("event_id", hi = Some(10L))))
    assert(lowKeys.size < all.size)
    // a bound read must still see every matching row
    val gotRows = tbl.readPruned(Seq(ColBound("event_id", hi = Some(10L))))
      .filter(col("event_id") <= 10).count()
    assert(gotRows == tbl.read().filter(col("event_id") <= 10).count())

    // unanswerable bound types keep everything
    assert(tbl.prunedLiveFiles(Seq(ColBound("p_day", Some(1), Some(2)))).size == all.size)

    // MOR tables must NOT value-prune (a delta can supersede the stats):
    val mor = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/pruned_files_mor", "o_orderkey", "o_orderkey",
      tableType = TableType.Mor, statsCols = Seq("o_totalprice")))
    mor.dropIfExists()
    mor.insert(orders, numFiles = 4)
    mor.upsert(orders.limit(5).withColumn("o_totalprice", lit(9999999.0)))
    val morAll = mor.timeline.liveFiles(None)
    val morPruned = mor.prunedLiveFiles(Seq(ColBound("o_totalprice", Some(9999999.0))))
    assert(morPruned.size == morAll.size, "MOR value pruning is unsound and must not engage")
  }

  test("orphan reaper never touches a live in-flight write; stale writers are fenced") {
    val tbl = freshTable("orphans_inflight")
    tbl.insert(orders, numFiles = 2)
    // a slow-but-alive writer: reserved instant, old files, FRESH marker
    val i = tbl.timeline.reserveInstant()
    val dir = new java.io.File(s"/tmp/graft_spec/orphans_inflight/data/$i")
    dir.mkdirs()
    val f = new java.io.File(dir, "part-slow.parquet")
    assert(f.createNewFile())
    assert(f.setLastModified(System.currentTimeMillis() - 7200000L))
    // files far older than the grace period, yet protected: the grace is
    // keyed off the RESERVATION, which is fresh
    assert(tbl.cleanOrphans(olderThanMs = 60000L) == 0)
    assert(f.exists())
    // now the reservation itself goes stale → the writer is presumed dead:
    // the reaper fences it (tombstone) and reaps its files
    val marker = new java.io.File(s"/tmp/graft_spec/orphans_inflight/_graft/$i.inflight")
    assert(marker.exists())
    assert(marker.setLastModified(System.currentTimeMillis() - 7200000L))
    assert(tbl.cleanOrphans(olderThanMs = 60000L) == 1)
    assert(!f.exists())
    // the fenced writer cannot commit over its deleted files
    val boom = intercept[IllegalStateException] {
      tbl.timeline.commit(Commit(i, "insert", Nil, Nil, Map.empty))
    }
    assert(boom.getMessage.contains("aborted"))
  }

  test("pre-commit validation does not clobber a user view named graft_candidate") {
    val tbl = freshTable("precommit_view")
    spark.range(3).createOrReplaceTempView("graft_candidate")
    tbl.addPreCommitValidator("no_neg",
      "SELECT 1 FROM graft_candidate WHERE o_totalprice < 0 LIMIT 1")
    tbl.insert(orders, numFiles = 2) // validates against the CANDIDATE, passes
    // the user's view survived and still means what it meant
    assert(spark.table("graft_candidate").count() == 3)
    // and no per-commit view lingers after validation
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_candidate_")))
    spark.catalog.dropTempView("graft_candidate")
  }

  test("archive keeps the commits a savepoint needs; clean honors it") {
    val tbl = freshTable("cp_savepoint")
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.savepoint(i1)
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")))
    tbl.checkpointTimeline()
    // commits <= savepoint stay hot (no checkpoint covers the savepoint)
    assert(tbl.timeline.instants().contains(i1))
    // the savepointed snapshot is still reconstructable and clean-protected
    assert(tbl.readAsOf(i1).count() == orders.count())
    tbl.clean(Timeline.MaxInstant)
    assert(tbl.readAsOf(i1).count() == orders.count())
  }

  test("restore across an archived range rejects loudly and leaves state untouched") {
    // savepoint → commits after it → checkpoint archives those commits →
    // restore to the savepoint can no longer roll them back one by one.
    // The contract: REJECT before mutating anything — never a partial
    // restore (fuzz round 12 proved restore interacts with folded index
    // state; this pins the archive interaction the same way)
    val tbl = freshTable("restore_archived")
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.savepoint(i1)
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U")))
    tbl.upsert(orders.filter(col("o_orderkey") % 10 === 1)
      .withColumn("o_orderstatus", lit("V")))
    tbl.checkpointTimeline() // archives the two post-savepoint commits
    assert(tbl.timeline.archivedInstants().exists(_ > i1),
      "precondition: commits after the savepoint must be archived")
    val rowsBefore = tbl.read().orderBy("o_orderkey").collect()
    val filesBefore = tbl.timeline.liveFiles(None).map(_.path).toSet
    val commitsBefore = tbl.timeline.instants()
    val cpsBefore = tbl.timeline.checkpoints()
    val ex = intercept[IllegalArgumentException](tbl.restore(i1))
    assert(ex.getMessage.contains("archived"), ex.getMessage)
    // NOTHING moved: same snapshot, same live files, same hot timeline,
    // same checkpoints — the reject happened before any mutation
    assert(tbl.timeline.liveFiles(None).map(_.path).toSet == filesBefore)
    assert(tbl.timeline.instants() == commitsBefore)
    assert(tbl.timeline.checkpoints() == cpsBefore)
    assert(tbl.read().orderBy("o_orderkey").collect().sameElements(rowsBefore))
    // and the savepointed snapshot itself is still readable (its commits
    // were kept hot by archive's savepoint-needed rule)
    assert(tbl.readAsOf(i1).count() == orders.count())
  }

  test("filesMeta is served from the timeline and matches the physical layout") {
    val tbl = freshTable("files_meta", keyGen = FieldPartition("o_orderpriority"))
    tbl.insert(orders, numFiles = 2)
    val meta = tbl.filesMeta().collect()
    // every listed file exists on disk, and nothing parquet on disk is unlisted
    val root = new java.io.File("/tmp/graft_spec/files_meta")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    val onDisk = walk(root).map(_.getPath)
      .filter(p => p.endsWith(".parquet") && p.contains("/data/"))
      .map(_.stripPrefix(root.getPath + "/")).toSet
    assert(meta.map(_.getString(0)).toSet == onDisk)
    // per-partition row rollup equals the data
    val fromMeta = meta.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(5)).sum)
    val expected = orders.groupBy("o_orderpriority").count().collect()
      .map(r => s"o_orderpriority=${r.getString(0)}" -> r.getLong(1)).toMap
    assert(fromMeta.toMap == expected)
  }

  test("shallow clone copies zero data files; clone-local upserts never touch the source") {
    val src = freshTable("clone_src")
    src.insert(orders, numFiles = 3)
    val clone = freshTable("clone_dst")
    clone.cloneFrom(src)
    def dataFiles(dir: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).map(_.getPath)
        .filter(p => p.endsWith(".parquet") && p.contains("/data/")).toSet
    }
    val srcBefore = dataFiles("/tmp/graft_spec/clone_src")
    assert(dataFiles("/tmp/graft_spec/clone_dst").isEmpty) // metadata only
    assert(clone.read().count() == orders.count())
    // clone-local upsert rewrites into clone-owned files, source untouched
    clone.upsert(orders.limit(100).withColumn("o_orderstatus",
      org.apache.spark.sql.functions.lit("C")))
    assert(dataFiles("/tmp/graft_spec/clone_src") == srcBefore)
    assert(dataFiles("/tmp/graft_spec/clone_dst").nonEmpty)
    assert(clone.read().filter(org.apache.spark.sql.functions
      .col("o_orderstatus") === "C").count() == 100)
    assert(src.read().filter(org.apache.spark.sql.functions
      .col("o_orderstatus") === "C").count() == 0)
  }

  test("config matrix: insert+upsert+delete parity across COW/MOR x index x partitioning") {
    // the reference's compatibility harness sweeps cow/mor x metadata x
    // partitioned configs (compatibility_test_main.sh, configs/*.props);
    // here the same write sequence must yield the identical table under
    // every config combination — layout choices may never change answers
    import org.apache.spark.sql.functions._
    val orders = GraftSession.table(spark, sfDir, "orders")
    val expected = orders
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 10 === 0, "U").otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 100)
          .otherwise(col("o_totalprice")))
      .filter(col("o_orderkey") % 97 =!= 0)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val configs = for {
      tt <- Seq(TableType.Cow, TableType.Mor)
      rib <- Seq(0, 8)
      kg <- Seq[KeyGen](NoPartition, FieldPartition("o_orderstatus"))
    } yield (tt, rib, kg)
    configs.foreach { case (tt, rib, kg) =>
      val name = s"matrix_${tt}_${rib}_${kg.getClass.getSimpleName}"
      val tbl = GraftTable(spark, GraftTableConfig(
        s"/tmp/graft_spec/$name", "o_orderkey", "o_orderkey",
        keyGen = kg, tableType = tt, recordIndexBuckets = rib))
      tbl.dropIfExists()
      tbl.insert(orders, numFiles = 2)
      tbl.upsert(orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 100))
      tbl.delete(col("o_orderkey") % 97 === 0)
      val got = tbl.read().select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"config $name diverged: got ${got.count()} rows, want ${expected.count()}")
      tbl.dropIfExists()
    }
  }

  test("ColStat.merge: commutative, associative, and never loses a member range") {
    import graft.tables.ColStat
    val rnd = new scala.util.Random(42)
    def numStat(): ColStat = {
      val a = rnd.nextInt(1000) - 500
      ColStat(ColStat.Num, a.toString, (a + rnd.nextInt(100)).toString)
    }
    def lexStat(): ColStat = {
      val a = f"k${rnd.nextInt(900) + 100}"
      val b = f"k${rnd.nextInt(900) + 100}"
      if (a <= b) ColStat(ColStat.Lex, a, b) else ColStat(ColStat.Lex, b, a)
    }
    (1 to 500).foreach { _ =>
      for (mk <- Seq(numStat _, lexStat _)) {
        val (x, y, z) = (mk(), mk(), mk())
        assert(x.merge(y) == y.merge(x))
        assert(x.merge(y).merge(z) == x.merge(y.merge(z)))
        val m = x.merge(y)
        // soundness for pruning: any probe overlapping a MEMBER range must
        // overlap the merged range (else partition-stats could drop a
        // partition that holds matching files)
        val probe: Any =
          if (x.kind == ColStat.Num) Double.box((rnd.nextInt(1400) - 700).toDouble)
          else f"k${rnd.nextInt(1100)}"
        if (x.overlaps(probe, probe) || y.overlaps(probe, probe))
          assert(m.overlaps(probe, probe), s"merge lost $probe: $x + $y = $m")
      }
    }
    intercept[IllegalArgumentException](numStat().merge(lexStat()))
  }

  test("partition-stats index prunes whole partitions a path-pruner cannot") {
    import org.apache.spark.sql.functions.col
    val orders = GraftSession.table(spark, sfDir, "orders")
    val tbl = graft.tables.GraftTable(spark, graft.tables.GraftTableConfig(
      "/tmp/graft_test/t_pstats", "o_orderkey", "o_orderkey",
      keyGen = graft.tables.TimestampDayPartition("o_orderdate", "p_month", "yyyy-MM"),
      statsCols = Seq("o_orderdate")))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 2)
    val stats = tbl.partitionStats("o_orderdate")
    assert(stats.size > 12, s"expected many month partitions, got ${stats.size}")
    val lo = java.sql.Timestamp.valueOf("1996-03-15 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-05-20 00:00:00")
    // the raw-timestamp range spans parts of Mar plus Apr/May 1996: the
    // index must keep EXACTLY those three month partitions (a path pruner
    // sees opaque p_month=1996-03 strings and cannot answer this at all)
    val live = stats.filter(_._2.overlaps(lo, hi)).keys.toSet
    assert(live == Set("p_month=1996-03", "p_month=1996-04", "p_month=1996-05"), live.toString)
    // and the pruned read equals the unpruned filter exactly
    val got = tbl.readBetweenPartitionStats("o_orderdate", lo, hi)
      .select(orders.columns.map(col).toSeq: _*)
    val want = orders.filter(col("o_orderdate").between(lo, hi))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"pruned read diverged: got ${got.count()}, want ${want.count()}")
    tbl.dropIfExists()
  }

  test("partition-stats read keeps partitions with stat-less files (statsCols evolution)") {
    import org.apache.spark.sql.functions.col
    val orders = GraftSession.table(spark, sfDir, "orders")
    val path = "/tmp/graft_test/t_pstats_evolve"
    val keyGen = graft.tables.TimestampDayPartition(
      "o_orderdate", "p_month", "yyyy-MM")
    // epoch 1: o_orderdate is NOT a stats column — files land stat-less
    val pre = graft.tables.GraftTable(spark, graft.tables.GraftTableConfig(
      path, "o_orderkey", "o_orderkey", keyGen = keyGen))
    pre.dropIfExists()
    pre.insert(orders.filter(col("o_orderkey") % 2 === 0), numFiles = 2)
    // epoch 2: the column becomes a stats column; later files carry stats
    val tbl = graft.tables.GraftTable(spark, graft.tables.GraftTableConfig(
      path, "o_orderkey", "o_orderkey", keyGen = keyGen,
      statsCols = Seq("o_orderdate")))
    tbl.insert(orders.filter(col("o_orderkey") % 2 =!= 0), numFiles = 2)
    val lo = java.sql.Timestamp.valueOf("1996-03-15 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-05-20 00:00:00")
    // every month partition now holds stat-less epoch-1 files, so NO
    // partition may prune away; the read must equal the plain filter —
    // before the conservatism fix the partition-level cut dropped every
    // epoch-1 row (partitions absent from partitionStats never survived)
    val got = tbl.readBetweenPartitionStats("o_orderdate", lo, hi)
      .select(orders.columns.map(col).toSeq: _*)
    val want = orders.filter(col("o_orderdate").between(lo, hi))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"pruned read diverged: got ${got.count()}, want ${want.count()}")
    tbl.dropIfExists()
  }

  test("cross-version read battery: a v0/legacy-written table reads exactly " +
      "under current code (compatibility_test parity)") {
    // the reference's compatibility harness writes tables under an OLD
    // format version and reads them with NEW code (spark/scripts/
    // compatibility_test_main.sh:28-38). graft's v0 analogue: commit JSONs
    // with the LEGACY colStats shape ({"n": bool} instead of {"k": kind})
    // and NO per-file "len" — both shapes current code must still read,
    // the latter via the listed-scan fallback instead of the
    // metadata-served FileIndex.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/xver", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 4, secondaryIndexCols = Seq("o_orderpriority"),
      statsCols = Seq("o_totalprice", "o_orderpriority"),
      writeChangelog = true))
    tbl.dropIfExists()
    val i1 = tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_orderstatus", lit("X")))
    val iHead = tbl.delete(col("o_orderkey") % 17 === 0)
    def fingerprint(t: GraftTable): Seq[Any] = Seq(
      t.read().agg(count(lit(1)), sum(col("o_orderkey")),
        sum(length(col("o_orderstatus")))).head().toSeq,
      t.readAsOf(i1).agg(count(lit(1)), sum(col("o_orderkey"))).head().toSeq,
      t.incremental(i1, iHead).agg(count(lit(1))).head().toSeq,
      t.cdc(i1, iHead).groupBy("_change_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq,
      t.pointLookup(Seq(5L, 42L, 85L)).collect().map(_.toSeq).sortBy(_.toString).toSeq,
      t.readBySecondary("o_orderpriority", Seq("1-URGENT")).count())
    val want = fingerprint(tbl)

    // downgrade the marker AND rewrite every hot commit JSON to the legacy
    // on-disk shape current code's back-compat parser claims to read
    assert(TableServices.downgradeTable(tbl, 0))
    val fs = new org.apache.hadoop.fs.Path(tbl.cfg.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    tbl.timeline.instants().foreach { i =>
      val p = new org.apache.hadoop.fs.Path(
        s"${tbl.cfg.path}/_graft/$i.commit.json")
      val in = fs.open(p)
      val doc = try mapper.readTree(in) finally in.close()
      doc.path("adds").forEach { add =>
        val o = add.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        o.remove("len") // v0 commits had no file lengths
        val cs = o.path("colStats")
        if (cs.isObject) cs.fields().forEachRemaining { e =>
          val st = e.getValue.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          val kind = st.path("k").asText()
          st.remove("k")
          st.put("n", kind == ColStat.Num) // v1 wrote a boolean "n"
        }
      }
      val out = fs.create(p, true)
      try out.write(mapper.writeValueAsBytes(doc)) finally out.close()
    }
    // FRESH handle: no cached metadata from the pre-downgrade reads
    val legacy = GraftTable(spark, tbl.cfg)
    assert(TableServices.tableVersion(legacy) == 0)
    assert(fingerprint(legacy) == want,
      "v0/legacy-written table must read byte-identically under current code")
    // upgrade is metadata-only and must change nothing the reads see
    assert(TableServices.upgradeTable(legacy))
    assert(fingerprint(GraftTable(spark, tbl.cfg)) == want)
    tbl.dropIfExists()
  }

  test("full RLI fold of an emptied table writes an empty claim instead of " +
      "crashing on parquet schema inference") {
    // ADVICE round 14: a table emptied by deletes is exactly the state the
    // dead-weight escalation recurses into full=true on; the full fold's
    // liveness filter then drops EVERY mapping, the merged dir has no
    // visible parquet, and the coverage proof must under-claim (empty) —
    // not crash and strand the _folding marker for the async service to
    // crash-loop on.
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/empty_fold", "o_orderkey", "o_orderkey",
      recordIndexBuckets = 4))
    tbl.dropIfExists()
    tbl.insert(orders, numFiles = 4)
    tbl.upsert(orders.filter(col("o_orderkey") % 3 === 0))
    tbl.delete(col("o_orderkey") >= 0) // empty the table
    assert(tbl.read().count() == 0)
    tbl.compactRecordIndex(full = true) // must not throw
    // the fold marker must be gone: lookups proceed un-guarded and exact
    assert(tbl.pointLookup(Seq(1L, 2L, 3L)).count() == 0)
    val again = orders.limit(50)
    tbl.upsert(again)
    assert(tbl.pointLookup(Seq(1L)).count() == 1,
      "post-fold writes must index and look up normally")
    tbl.dropIfExists()
  }

  test("CDC derives delete images for drop-partition/TTL commits") {
    // remove-only commits write no changelog; the CDC read must derive
    // their delete images from the removed files (stream-fuzz-found:
    // consumers otherwise silently keep every dropped row)
    val tbl = GraftTable(spark, GraftTableConfig(
      "/tmp/graft_spec/cdc_droppart", "o_orderkey", "o_orderkey",
      keyGen = FieldPartition("o_orderpriority"), writeChangelog = true))
    tbl.dropIfExists()
    val i1 = tbl.insert(orders, numFiles = 2)
    val victim = tbl.timeline.liveFiles(None).map(_.partition)
      .filter(_.nonEmpty).distinct.sorted.head
    val droppedKeys = tbl.read()
      .filter(col("o_orderpriority") === victim.stripPrefix("o_orderpriority="))
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(droppedKeys.nonEmpty)
    val i2 = tbl.dropPartitions(_ == victim)
    val images = tbl.cdc(i1, i2)
    assert(images.filter(col("_change_type") === "delete").count() ==
      droppedKeys.size)
    val imagedKeys = images.filter(col("_change_type") === "delete")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(imagedKeys == droppedKeys,
      "derived delete images must cover exactly the dropped partition's keys")
    tbl.dropIfExists()
  }
}
