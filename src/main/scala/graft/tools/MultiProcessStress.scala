package graft.tools

import graft.GraftSession
import graft.tables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CROSS-PROCESS multi-writer stress — the one concurrency surface the
  * same-JVM storms can never reach: inside one JVM the per-table lock
  * (Timeline.commitLock) serializes reservation + commit before the
  * file-based protocol is ever consulted, so `createExclusive`
  * reservation races, the `.commit.lock` lease (acquire / holder
  * renewal / stale break), and rename-fenced commits had NO live
  * exercise. Here the parent builds the table, forks N real child JVMs
  * (each with its own SparkSession, like independent spark-submit jobs
  * sharing a table), each writing disjoint mod-101 slices with the
  * standard conflict/lease retry loop, while the parent's reader probes
  * snapshot count + a point lookup throughout. Then a hard gate: exact
  * final tags per slice, unchanged row count, zero reader anomalies.
  *
  * Usage: MultiProcessStress [writers] [commitsPerWriter] [sfDir] [outJson]
  * (defaults 2, 4, /root/testdata/sf0.01, BENCH_SF100_MULTIPROC.json in
  * the working directory). Children are launched from
  * target/scala-2.13/classes + /opt/spark/jars, the sbt-free classpath. */
object MultiProcessStress {
  def main(args: Array[String]): Unit = {
    val writers = args.headOption.map(_.toInt).getOrElse(2)
    val perWriter = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.01")
    val outPath = args.lift(3).getOrElse(
      new java.io.File(System.getProperty("user.dir"), "BENCH_SF100_MULTIPROC.json").getPath)
    require(writers * perWriter <= 101, "mod-101 slices must stay disjoint")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val path = "/tmp/graft_multiproc_stress/table"
    val tbl = GraftTable(spark, GraftTableConfig(
      path, "o_orderkey", "o_orderkey", recordIndexBuckets = 8))
    tbl.dropIfExists()
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val nOrders = orders.count()
    tbl.insert(orders, numFiles = 16)

    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

    val lease0 = Timeline.lockRetries.get()
    val t0 = System.nanoTime()
    val procs = (0 until writers).map { w =>
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
        "-Xmx3g", "-cp", s"$classesDir:/opt/spark/jars/*",
        "graft.tools.MultiProcessWriterChild",
        path, sfDir, w.toString, perWriter.toString)).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"/tmp/graft_multiproc_stress/child-$w.log"))
      pb.start()
    }

    var probes = 0
    var anomalies = 0
    val reader = GraftTable(spark, GraftTableConfig(
      path, "o_orderkey", "o_orderkey", recordIndexBuckets = 8))
    while (procs.exists(_.isAlive)) {
      try {
        if (reader.read().count() != nOrders) anomalies += 1
        if (reader.pointLookup(Seq(1L)).count() != 1) anomalies += 1
        probes += 1
      } catch { case scala.util.control.NonFatal(_) => anomalies += 1 }
      Thread.sleep(100L)
    }
    val wallS = (System.nanoTime() - t0) / 1e9
    val exitCodes = procs.map(_.waitFor())
    // lease contention in the CHILDREN is visible in their logs; the
    // parent's counter only covers its own probes
    val parentLease = Timeline.lockRetries.get() - lease0

    require(exitCodes.forall(_ == 0),
      s"child writers exited ${exitCodes.mkString(",")} — see /tmp/graft_multiproc_stress/child-*.log")
    val got = tbl.read()
    require(got.count() == nOrders, "row count drifted under cross-process writers")
    (0 until writers).foreach { w =>
      val slice = w * perWriter + (perWriter - 1)
      val want = orders.filter(col("o_orderkey") % 101 === slice).count()
      val tagged = got.filter(col("o_orderstatus") === s"P$w-C${perWriter - 1}").count()
      require(tagged == want,
        s"lost update: process $w final slice $slice has $tagged/$want rows")
    }
    require(anomalies == 0, s"$anomalies reader anomalies during the cross-process storm")

    // ---- HARD-KILL scenario: a child JVM destroyed mid-write (no abort
    // hooks, no cleanup — the kill -9 case the in-JVM crash-injection
    // spec cannot produce). The table must stay exact throughout, the
    // reaper must FENCE the dead writer's reservation (tombstone under
    // the commit lock, so a zombie could never commit) and reap its
    // orphan files, and a fresh writer must proceed normally.
    val killVictim = new ProcessBuilder((Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx3g", "-cp", s"$classesDir:/opt/spark/jars/*",
      "graft.tools.MultiProcessWriterChild",
      path, sfDir, "9", "10")).toArray: _*)
    killVictim.redirectErrorStream(true)
    killVictim.redirectOutput(new java.io.File("/tmp/graft_multiproc_stress/child-kill.log"))
    val victim = killVictim.start()
    // kill it MID-WRITE: wait for an uncommitted reservation whose data
    // dir already holds files (so the reaper has real orphans to fence
    // and delete), not merely for landed commits
    val commitsBefore = tbl.timeline.instants().size
    val killDeadline = System.currentTimeMillis() + 300000L
    def midWriteInstant(): Option[String] =
      tbl.timeline.inflightReservations().keySet.find { i =>
        val d = new java.io.File(s"$path/data/$i")
        d.isDirectory && d.listFiles != null &&
          d.listFiles.exists(_.getName.endsWith(".parquet"))
      }
    var killedAt: Option[String] = None
    while (killedAt.isEmpty && System.currentTimeMillis() < killDeadline) {
      if (tbl.timeline.instants().size >= commitsBefore + 2) {
        killedAt = midWriteInstant()
        if (killedAt.isDefined) { victim.destroyForcibly(); () }
      }
      if (killedAt.isEmpty) Thread.sleep(20L)
    }
    require(killedAt.isDefined, "never caught the victim mid-write")
    victim.waitFor()
    val nAfterKill = tbl.read().count()
    require(nAfterKill == nOrders, s"kill corrupted the table: $nAfterKill rows")
    require(tbl.pointLookup(Seq(1L)).count() == 1, "kill broke point lookups")
    // fence + reap: the dead writer's reservation ages past the grace
    // period, gets tombstoned, and its uncommitted files are deleted
    Thread.sleep(2500L)
    val reaped = tbl.cleanOrphans(olderThanMs = 2000L)
    val inflightLeft = tbl.timeline.inflightReservations().size
    require(inflightLeft == 0,
      s"$inflightLeft stale reservations survived the reaper")
    // the table moves on: a fresh writer lands normally
    tbl.upsert(orders.filter(col("o_orderkey") === 3L)
      .withColumn("o_orderstatus", lit("AFTER-KILL")))
    require(tbl.read().count() == nOrders, "post-kill upsert drifted the count")
    require(tbl.read().filter(col("o_orderstatus") === "AFTER-KILL").count() == 1)

    // ---- SERVICES-ISOLATED arm: maintenance in its OWN process — a
    // child JVM running ONLY AsyncServices (compaction + index folds) —
    // while two FOREIGN writer processes append MOR deltas. This is the
    // deployment shape the reference's async story implies (async
    // compaction as a separate concern from ingest), and the one the
    // same-JVM storms cannot reach: the fold marker, the in-flight-
    // reservation source filter, and the commit lease have no shared JVM
    // lock to hide behind here — rename visibility is real.
    val morPath = "/tmp/graft_multiproc_stress/mor_table"
    val morCfg = GraftTableConfig(morPath, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8, tableType = TableType.Mor)
    val morTbl = GraftTable(spark, morCfg)
    morTbl.dropIfExists()
    morTbl.insert(orders, numFiles = 8)
    val stopFile = "/tmp/graft_multiproc_stress/services.stop"
    val svcOut = "/tmp/graft_multiproc_stress/services.json"
    new java.io.File(stopFile).delete()
    new java.io.File(svcOut).delete()
    def spawn(cls: String, extra: Seq[String], log: String) = {
      val cmd = (Seq(javaBin) ++ addOpens ++ Seq("-Xmx3g", "-cp",
        s"$classesDir:/opt/spark/jars/*", cls) ++ extra).toArray
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(log))
      pb.start()
    }
    val svcProc = spawn("graft.tools.MultiProcessServicesChild",
      Seq(morPath, stopFile, svcOut),
      "/tmp/graft_multiproc_stress/services.log")
    val morWriters = 2
    // 2x the COW arm's commits per writer: the window has to be wide
    // enough that the foreign services child's compaction + fold run
    // WHILE these writers are still committing (the overlap is the test)
    val morPer = perWriter * 2
    val morProcs = (0 until morWriters).map { w =>
      spawn("graft.tools.MultiProcessWriterChild",
        Seq(morPath, sfDir, w.toString, morPer.toString, TableType.Mor),
        s"/tmp/graft_multiproc_stress/mor-child-$w.log")
    }
    var morProbes = 0
    var morAnomalies = 0
    val morReader = GraftTable(spark, morCfg)
    while (morProcs.exists(_.isAlive)) {
      try {
        if (morReader.read().count() != nOrders) morAnomalies += 1
        if (morReader.pointLookup(Seq(1L)).count() != 1) morAnomalies += 1
        morProbes += 1
      } catch { case scala.util.control.NonFatal(_) => morAnomalies += 1 }
      Thread.sleep(100L)
    }
    val morExits = morProcs.map(_.waitFor())
    // Wait — bounded — until the services child's work is VISIBLE ON
    // DISK before asking it to stop: a compaction commit on the timeline
    // and the RLI folded to within the trigger threshold. A fixed grace
    // is a race by construction (the first run of this arm stopped the
    // child mid-compaction after a 1.5 s grace: writers finished inside
    // its final polls and close() rolled the in-flight compaction back —
    // zero services work despite armed triggers). The deadline keeps a
    // wedged service from hanging the stress; the folds gate below still
    // fails loudly in that case.
    val svcDeadline = System.currentTimeMillis() + 180000L
    def compacted(): Boolean = {
      val t = morTbl.timeline
      t.instants().exists(i => t.readCommit(i).op == "compact")
    }
    def rliDirs(): Int = {
      val d = new java.io.File(s"$morPath/_graft/rli")
      if (!d.isDirectory) 0
      else d.listFiles().count(f => f.isDirectory)
    }
    while ((!compacted() || rliDirs() > 3) &&
        System.currentTimeMillis() < svcDeadline)
      Thread.sleep(500L)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(stopFile), "stop")
    val svcExit = svcProc.waitFor()
    require(morExits.forall(_ == 0),
      s"MOR writers exited ${morExits.mkString(",")} — see mor-child-*.log")
    require(svcExit == 0,
      "services child failed (its close() rethrows service-thread errors) — see services.log")
    val svcJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(svcOut))).trim
    def svcCount(k: String): Int =
      ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(svcJson)
        .map(_.group(1).toInt).getOrElse(0)
    require(svcCount("index_folds") > 0,
      s"services child ran zero index folds: $svcJson")
    val morGot = morTbl.read()
    require(morGot.count() == nOrders,
      "MOR row count drifted under the services-isolated storm")
    (0 until morWriters).foreach { w =>
      val slice = w * morPer + (morPer - 1)
      val want = orders.filter(col("o_orderkey") % 101 === slice).count()
      val tagged = morGot.filter(
        col("o_orderstatus") === s"P$w-C${morPer - 1}").count()
      require(tagged == want,
        s"lost update (services arm): process $w slice $slice has $tagged/$want rows")
    }
    require(morAnomalies == 0,
      s"$morAnomalies reader anomalies during the services-isolated storm")
    // point lookups stay exact through whatever index state the foreign
    // process's folds left behind
    require(morTbl.pointLookup(Seq(1L, 7L, 100L)).count() == 3,
      "post-storm point lookup missed rows through the folded index")

    // ---- ROLLBACK-vs-FOREIGN-FOLD arm: the coverage-manifest race on
    // its REAL surface. A COW upsert REPLACES files; rolling it back
    // RESURRECTS them; a fold in a FOREIGN process that read its sources'
    // coverage before the rollback's manifest rewrite would re-claim
    // exactly the resurrected instants — after which indexed point
    // lookups silently prune the resurrected files (their mappings were
    // liveness-purged at fold time). The in-JVM fold lock cannot reach a
    // foreign process; what closes this window is the fold protocol
    // itself (source manifests re-read + timeline resurrection recheck
    // immediately before the claim is written — GraftTable round 13).
    // Gate: every post-rollback point lookup returns the pre-upsert row,
    // across many rollback/fold overlaps.
    val rbPath = "/tmp/graft_multiproc_stress/rollback_cow"
    val rbCfg = GraftTableConfig(rbPath, "o_orderkey", "o_orderkey",
      recordIndexBuckets = 8)
    val rbTbl = GraftTable(spark, rbCfg)
    rbTbl.dropIfExists()
    rbTbl.insert(orders, numFiles = 8)
    rbTbl.upsert(orders.filter(col("o_orderkey") === 1L)
      .withColumn("o_orderstatus", lit("SEED")))
    // merged base claiming coverage (a fold needs >= 2 source dirs)
    require(rbTbl.compactRecordIndex() == 2,
      "rollback-vs-fold arm: seed fold did not consume insert + upsert")
    val rbStop = "/tmp/graft_multiproc_stress/fold.stop"
    val rbOut = "/tmp/graft_multiproc_stress/fold.json"
    new java.io.File(rbStop).delete()
    new java.io.File(rbOut).delete()
    val foldProc = spawn("graft.tools.MultiProcessFoldChild",
      Seq(rbPath, rbStop, rbOut), "/tmp/graft_multiproc_stress/fold-child.log")
    val rbKeys = Seq(3L, 7L, 13L)
    val rbBaseline = rbTbl.pointLookup(rbKeys).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("o_orderstatus")).toMap
    require(rbBaseline.size == rbKeys.size, "probe keys missing before the storm")
    val rbRounds = 20
    var rbAnomalies = 0
    (1 to rbRounds).foreach { r =>
      // rewrite the probe keys' files: their pre-upsert versions die, so
      // any foreign fold in this window liveness-purges those mappings
      val inst = rbTbl.upsert(orders.filter(col("o_orderkey").isin(rbKeys: _*))
        .withColumn("o_orderstatus", lit(s"RB$r")))
      // deterministic spread over the fold's own duration (~0.5-1.5 s in
      // the child): short sleeps hit the fold mid-read (it crashes on the
      // vanished source — legal), long sleeps let it COMPLETE and claim
      // coverage first, so the rollback's un-claim and the fold's
      // last-before-write recheck both get real overlaps
      Thread.sleep(50L + (r * 137L) % 1900L)
      rbTbl.rollback(inst) // resurrects the pre-upsert files
      rbKeys.foreach { k =>
        val got = rbTbl.pointLookup(Seq(k)).collect()
        if (got.length != 1 ||
            got(0).getAs[String]("o_orderstatus") != rbBaseline(k)) {
          rbAnomalies += 1
          println(s"[multiproc] rollback-vs-fold anomaly r$r key $k: " +
            s"${got.map(_.getAs[String]("o_orderstatus")).mkString(",")}")
        }
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(rbStop), "stop")
    val foldExit = foldProc.waitFor()
    val foldJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(rbOut))).trim
    def foldCount(k: String): Int =
      ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(foldJson)
        .map(_.group(1).toInt).getOrElse(0)
    require(foldExit == 0, "fold child failed — see fold-child.log")
    require(foldCount("folds") > 0,
      s"foreign fold child never folded — no race was exercised: $foldJson")
    require(rbAnomalies == 0,
      s"$rbAnomalies silent lookup misses under rollback-vs-foreign-fold")
    require(rbTbl.read().count() == nOrders,
      "rollback-vs-fold arm drifted the row count")

    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val out =
      s"""{"writers":$writers,"commits":${writers * perWriter},"wall_s":${f2(wallS)},""" +
      s""""commits_per_s":${f2(writers * perWriter / wallS)},""" +
      s""""reader_probes":$probes,"reader_anomalies":$anomalies,""" +
      s""""parent_lease_retries":$parentLease,"child_exits":[${exitCodes.mkString(",")}],""" +
      s""""kill":{"orphans_reaped":$reaped,"stale_reservations_left":$inflightLeft,""" +
      s""""post_kill_exact":true},""" +
      s""""services_isolated":{"writers":$morWriters,"commits":${morWriters * morPer},""" +
      s""""reader_probes":$morProbes,"reader_anomalies":$morAnomalies,""" +
      s""""services":$svcJson,"writer_exits":[${morExits.mkString(",")}],""" +
      s""""services_exit":$svcExit,"correct":true},""" +
      s""""rollback_vs_foreign_fold":{"rounds":$rbRounds,"anomalies":$rbAnomalies,""" +
      s""""fold_child":$foldJson,"fold_exit":$foldExit,"correct":true},""" +
      s""""correct":true,"note":"N real child JVMs (own SparkSessions) sharing one table: """ +
      s"""exercises the cross-process reservation createExclusive, the .commit.lock lease, """ +
      s"""and rename-fenced commits that the same-JVM storms never reach (the per-table JVM """ +
      s"""lock serializes them first). Hard gate: exact per-slice tags, unchanged count, """ +
      s"""zero reader anomalies. The kill scenario destroyForcibly()s a child mid-write, """ +
      s"""then requires an exact table, reaper fencing of the dead reservation, orphan """ +
      s"""cleanup, and a normal next write. The services_isolated arm runs ONLY """ +
      s"""AsyncServices (compaction + index folds) in its own child JVM against a MOR """ +
      s"""table two foreign writer processes append to: cross-process rename visibility """ +
      s"""for the fold-marker + lease protocol, gated on zero anomalies, exact slices, """ +
      s"""exact point lookups, and index_folds > 0. The rollback_vs_foreign_fold arm """ +
      s"""pins the coverage-manifest race: a foreign process folds continuously while """ +
      s"""the parent upserts and rolls back probe keys (each rollback resurrects files """ +
      s"""whose mappings a mid-flight fold may just have liveness-purged); every """ +
      s"""post-rollback point lookup must return the pre-upsert row — zero silent """ +
      s"""misses across the overlaps."}"""
    println(s"[multiproc] $out")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), out + "\n")
    catch { case e: Exception => System.err.println(s"[multiproc] FAILED to write $outPath: $e") }
    tbl.dropIfExists()
    morTbl.dropIfExists()
    spark.stop()
  }
}

/** Child-JVM entry: `<tablePath> <sfDir> <writerId> <commits> [tableType]`
  * — the standard retrying writer (conflicts and lease timeouts are the
  * two transient faces of contention) over this process's disjoint
  * slices. `tableType` defaults to COW; the services-isolated arm passes
  * `mor` so the writers append deltas the foreign services child
  * compacts. */
object MultiProcessWriterChild {
  def main(args: Array[String]): Unit = {
    val Array(path, sfDir, wStr, cStr) = args.take(4)
    val tableType = args.lift(4).getOrElse(TableType.Cow)
    val (w, commits) = (wStr.toInt, cStr.toInt)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tbl = GraftTable(spark, GraftTableConfig(
      path, "o_orderkey", "o_orderkey", recordIndexBuckets = 8,
      tableType = tableType))
    val orders = GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    (0 until commits).foreach { c =>
      val b = orders.filter(col("o_orderkey") % 101 === (w * commits + c))
        .withColumn("o_orderstatus", lit(s"P$w-C$c"))
      var attempts = 0
      var done = false
      while (!done) {
        try { tbl.upsert(b); done = true }
        catch {
          case _: CommitConflictException | _: LockTimeoutException if attempts < 60 =>
            attempts += 1
            println(s"[child-$w] retry $attempts at commit $c")
            Thread.sleep(100L * math.min(attempts, 5))
        }
      }
      println(s"[child-$w] commit $c done")
    }
    spark.stop()
  }
}

/** Child-JVM entry running ONLY the table services — the deployment
  * shape the reference's async story implies (DeltaStreamerExample's
  * async compaction as a separate concern): maintenance in its OWN
  * process racing FOREIGN writers it cannot see through any JVM lock.
  * The fold-marker protocol, the in-flight-reservation source filter,
  * and the commit lease all claim cross-process safety; this is where
  * rename visibility is real. Args: `<tablePath> <stopFile> <outJson>` —
  * polls until `stopFile` appears, then closes (which rethrows any
  * service failure → nonzero exit) and writes its counters to
  * `outJson`. */
object MultiProcessServicesChild {
  def main(args: Array[String]): Unit = {
    val Array(path, stopFile, outFile) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // WARN, not ERROR: the service warn-logs deferred folds and lost
    // commit races — the child's log is the only window into them
    spark.sparkContext.setLogLevel("WARN")
    val tbl = GraftTable(spark, GraftTableConfig(
      path, "o_orderkey", "o_orderkey", recordIndexBuckets = 8,
      tableType = TableType.Mor))
    // tight triggers so the sandbox run exercises both services many
    // times: compact every 3 delta commits, fold past 3 index dirs
    val svc = new graft.streaming.AsyncServices(tbl,
      targetRows = 2000000L, deltaCommits = 3, deltaSeconds = 600L,
      pollMs = 200L, indexFoldDirs = 3).start()
    var lastBeat = 0L
    while (!new java.io.File(stopFile).exists()) {
      Thread.sleep(100L)
      if (System.currentTimeMillis() - lastBeat > 2000L) {
        lastBeat = System.currentTimeMillis()
        println(s"[services-beat] instants=${tbl.timeline.instants().size} " +
          s"compactions=${svc.compactionsRun} folds=${svc.indexFoldsRun} " +
          s"conflicts=${svc.conflictsRetried} failure=${svc.failure.isDefined}")
      }
    }
    svc.close() // throws (→ exit 1) if the service thread ever failed
    val json =
      s"""{"compactions":${svc.compactionsRun},"index_folds":${svc.indexFoldsRun},""" +
      s""""conflicts_retried":${svc.conflictsRetried}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(s"[services] $json")
    spark.stop()
  }
}

/** Child-JVM entry looping ONLY record-index folds on a COW table — the
  * foreign-process foil for the rollback_vs_foreign_fold arm. A fold
  * that crashes mid-run (its source dir deleted under it by the parent's
  * rollback) is LEGAL — the fold protocol is crash-safe and the marker
  * falls back lookups to their exact non-index path — so crashes are
  * counted, not fatal; silent lookup misses in the PARENT are the only
  * failure. Args: `<tablePath> <stopFile> <outJson>`. */
object MultiProcessFoldChild {
  def main(args: Array[String]): Unit = {
    val Array(path, stopFile, outFile) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tbl = GraftTable(spark, GraftTableConfig(
      path, "o_orderkey", "o_orderkey", recordIndexBuckets = 8))
    var folds = 0
    var noops = 0
    var crashes = 0
    while (!new java.io.File(stopFile).exists()) {
      try {
        if (tbl.compactRecordIndex() > 0) folds += 1 else noops += 1
      } catch { case scala.util.control.NonFatal(e) =>
        crashes += 1
        println(s"[fold-child] fold crashed (legal, crash-safe): ${e.getMessage}")
      }
      Thread.sleep(30L)
    }
    val json = s"""{"folds":$folds,"noops":$noops,"crashes":$crashes}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(s"[fold-child] $json")
    spark.stop()
  }
}
