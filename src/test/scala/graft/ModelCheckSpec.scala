package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row => SqlRow, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.tables._

/** Model-based differential fuzz of the table core: a seeded random
  * sequence of the PUBLIC mutations (upsert with in-batch duplicate
  * keys, predicate and keyed deletes, compaction, index folds, rollback,
  * savepoint/restore, timeline checkpoint, ALTER-style add/drop column)
  * is applied in lockstep to the real table and to a trivial in-memory
  * map, and the two are compared — full snapshot, point lookups (hit and
  * miss), secondary-index equality, and time-travel against remembered
  * historical snapshots. The scenario specs pin behaviors someone
  * thought of; this spec exists for the interleavings nobody did (the
  * round-11/12 write-path bugs — fold source races, ghost reservations —
  * were all "legal op sequences nobody had composed"). Seeded, so a
  * failure replays exactly.
  *
  * Schema semantics under test (and mirrored by the comparator): adds
  * and drops are metadata-only and TABLE-WIDE — a dropped column
  * vanishes from every read including time travel, an added column reads
  * as NULL for rows written before it — so both sides are always
  * compared over the CURRENT live column set. */
class ModelCheckSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession =
    GraftSession.builder("graft-modelcheck", "4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private val KeySpace = 3000L
  private val Groups = 20

  /** extras: only the values a write actually carried; columns the row
    * never saw read back as NULL and are normalized at compare time. */
  private case class RowM(ver: Long, grp: Long, v: String,
      extras: Map[String, Long])

  private def runScenario(name: String, tableType: String, rounds: Int,
      seed: Long, schemaOps: Boolean): Unit = {
    val rng = new Random(seed)
    val root = s"/tmp/graft_spec/modelcheck_$name"
    val tbl = GraftTable(spark, GraftTableConfig(root, "id", "ver",
      tableType = tableType, recordIndexBuckets = 4,
      secondaryIndexCols = Seq("grp"), statsCols = Seq("grp")))
    tbl.dropIfExists()

    val model = mutable.Map.empty[Long, RowM]
    // committed history since the last checkpoint: instant -> snapshot
    // (rollback pops it; restore truncates into it; readAsOf replays it)
    val history = mutable.ArrayBuffer.empty[(String, Map[Long, RowM])]
    val liveExtras = mutable.ArrayBuffer.empty[String] // add/drop columns
    var nextExtra = 0
    var savepointAt: Option[String] = None
    // a savepoint whose post-savepoint commits were ARCHIVED by a later
    // checkpoint: restore() to it must reject loudly and mutate NOTHING
    // (the archive x restore interaction pin, fuzz form)
    var staleSavepoint: Option[String] = None
    var opSeq = 0L

    def batchDf(rows: Seq[(Long, RowM)]): DataFrame = {
      val schema = StructType(
        Seq(StructField("id", LongType), StructField("ver", LongType),
          StructField("grp", LongType), StructField("v", StringType)) ++
          liveExtras.map(c => StructField(c, LongType, nullable = true)))
      val data = rows.map { case (k, r) =>
        SqlRow.fromSeq(Seq(k, r.ver, r.grp, r.v) ++
          liveExtras.map(c => r.extras.get(c).map(Long.box).orNull))
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data, 2), schema)
    }

    def freshRows(n: Int): Seq[(Long, RowM)] = {
      opSeq += 1
      val base = opSeq * 100000L
      val picked = Seq.fill(n)(rng.nextLong(KeySpace))
      // in-batch duplicate keys with distinct vers exercise precombine;
      // the highest ver must win
      val dups = picked.take(n / 4)
      (picked ++ dups).zipWithIndex.map { case (k, i) =>
        val extras = liveExtras
          .filter(_ => rng.nextDouble() < 0.7)
          .map(c => c -> rng.nextLong(1000L)).toMap
        k -> RowM(base + i, k % Groups, s"$name-$opSeq-$i", extras)
      }
    }

    def applyBatchToModel(rows: Seq[(Long, RowM)]): Unit =
      rows.groupBy(_._1).foreach { case (k, vs) =>
        model(k) = vs.map(_._2).maxBy(_.ver) // precombine: max ver wins
      }

    def record(instant: String): Unit =
      history += instant -> model.toMap

    // normalized comparable form over the CURRENT live columns
    type Norm = Map[Long, (Long, Long, String, Seq[Option[Long]])]
    def normModel(m: Map[Long, RowM]): Norm =
      m.map { case (k, r) =>
        k -> (r.ver, r.grp, r.v, liveExtras.toSeq.map(r.extras.get))
      }
    def normDf(df: DataFrame): Norm = {
      val cols = Seq("id", "ver", "grp", "v") ++ liveExtras
      df.select(cols.map(c => col(s"`$c`")): _*).collect().map { r =>
        val extras = liveExtras.indices.map { i =>
          if (r.isNullAt(4 + i)) None else Some(r.getLong(4 + i))
        }
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), extras.toSeq)
      }.toMap
    }

    def diffMsg(round: Int, what: String, got: Norm, want: Norm): String = {
      val extra = got.keySet -- want.keySet
      val missing = want.keySet -- got.keySet
      val drift = got.keySet.intersect(want.keySet)
        .filter(k => got(k) != want(k)).take(3)
      s"[$name r$round seed=$seed] $what drift: extra=${extra.take(3)} " +
        s"missing=${missing.take(3)} " +
        s"changed=${drift.map(k => (k, got(k), want(k)))}"
    }

    def verify(round: Int): Unit = {
      val got = normDf(tbl.read())
      val want = normModel(model.toMap)
      assert(got == want, diffMsg(round, "snapshot", got, want))
      // point lookups: 3 present + 2 absent keys
      rng.shuffle(model.keys.toSeq).take(3).foreach { k =>
        val hit = tbl.pointLookup(Seq(k)).collect()
        assert(hit.length == 1 && hit(0).getAs[Long]("ver") == model(k).ver,
          s"[$name r$round seed=$seed] pointLookup($k) wrong")
      }
      Seq.fill(2)(rng.nextLong(KeySpace) + KeySpace)
        .foreach(k => assert(tbl.pointLookup(Seq(k)).count() == 0))
      // secondary-index equality on a random group
      val g = rng.nextLong(Groups)
      val gotG = normDf(tbl.readBySecondary("grp", Seq(g)))
      val wantG = normModel(model.filter(_._2.grp == g).toMap)
      assert(gotG == wantG, diffMsg(round, s"SI grp=$g", gotG, wantG))
      // time travel against one remembered historical snapshot
      if (history.size > 1) {
        val (inst, snap) = history(rng.nextInt(history.size))
        val gotAsOf = normDf(tbl.readAsOf(inst))
        assert(gotAsOf == normModel(snap),
          diffMsg(round, s"readAsOf($inst)", gotAsOf, normModel(snap)))
      }
    }

    // seed the table
    val seedRows = freshRows(400)
    applyBatchToModel(seedRows)
    record(tbl.insert(batchDf(seedRows), numFiles = 4))

    (1 to rounds).foreach { round =>
      rng.nextInt(if (schemaOps) 15 else 10) match {
        case 0 | 1 | 2 | 3 => // upsert (the common op)
          val rows = freshRows(20 + rng.nextInt(180))
          applyBatchToModel(rows)
          record(tbl.upsert(batchDf(rows)))
        case 4 => // keyed delete: mix of present and absent keys
          val keys = Seq.fill(30)(rng.nextLong(KeySpace * 2))
          import spark.implicits._
          val inst = tbl.deleteByKeys(keys.toDF("id"))
          keys.foreach(model.remove)
          record(inst)
        case 5 => // predicate delete on the indexed column
          val g = rng.nextLong(Groups)
          val inst = tbl.delete(col("grp") === g)
          model.filterInPlace { case (_, r) => r.grp != g }
          record(inst)
        case 6 => // compaction: no visible change
          record(tbl.compact(targetRows = 2000L))
        case 7 => // index folds: no visible change, no commit
          tbl.compactRecordIndex()
          tbl.compactSecondaryIndex("grp")
        case 8 if history.size > 1 => // rollback the latest commit
          val (inst, _) = history.last
          tbl.rollback(inst)
          history.remove(history.size - 1)
          model.clear()
          model ++= history.last._2
          savepointAt = savepointAt.filter(s => history.exists(_._1 == s))
        case 9 if history.size > 2 => // checkpoint: archives the replay
          // a savepoint older than the new checkpoint gets its follow-up
          // commits archived — remember it as permanently un-restorable
          staleSavepoint = savepointAt.filter(_ != history.last._1)
            .orElse(staleSavepoint)
          tbl.checkpointTimeline()
          // archived instants fail loudly on readAsOf and can't be rolled
          // back — the model keeps only the latest (still-live) snapshot
          val keep = history.last
          history.clear()
          history += keep
          savepointAt = None
        case 10 => // ALTER TABLE ADD COLUMNS (metadata-only)
          val c = s"x$nextExtra"; nextExtra += 1
          tbl.addColumns(Seq(StructField(c, LongType, nullable = true)))
          liveExtras += c
        case 11 if liveExtras.nonEmpty => // ALTER TABLE DROP COLUMN
          val c = liveExtras.remove(rng.nextInt(liveExtras.size))
          tbl.dropColumns(Seq(c))
        case 12 if tbl.timeline.instants().contains(history.last._1) =>
          // savepoint the current snapshot (hot commits only — archived
          // instants are refused by the product, by contract; right after
          // a checkpoint the kept history head is archived)
          savepointAt = Some(history.last._1)
          tbl.savepoint(history.last._1)
        case 13 if savepointAt.exists(s => history.exists(_._1 == s)) =>
          // restore: every commit after the savepoint rolls back
          val s = savepointAt.get
          tbl.restore(s)
          val idx = history.indexWhere(_._1 == s)
          history.remove(idx + 1, history.size - idx - 1)
          model.clear()
          model ++= history.last._2
        case 14 if staleSavepoint.nonEmpty =>
          // archive x restore pin: restoring to a savepoint whose
          // follow-up commits were archived must REJECT loudly and
          // mutate nothing — the model stays as-is and the next verify
          // round catches any partial mutation
          val ex = intercept[IllegalArgumentException](
            tbl.restore(staleSavepoint.get))
          assert(ex.getMessage.contains("archived"),
            s"[$name seed=$seed] stale restore rejected for the wrong " +
              s"reason: ${ex.getMessage}")
        case _ => // chosen op not applicable yet: cheap upsert
          val rows = freshRows(10)
          applyBatchToModel(rows)
          record(tbl.upsert(batchDf(rows)))
      }
      if (round % 3 == 0 || round == rounds) verify(round)
    }
    tbl.dropIfExists()
  }

  test("COW: 36 random op rounds match the in-memory model exactly") {
    runScenario("cow", TableType.Cow, rounds = 36, seed = 0xC0FFEE,
      schemaOps = false)
  }

  test("MOR: 30 random op rounds match the in-memory model exactly") {
    runScenario("mor", TableType.Mor, rounds = 30, seed = 0xBEEF42,
      schemaOps = false)
  }

  test("COW + schema evolution/savepoints: 36 rounds match the model") {
    runScenario("cow_ddl", TableType.Cow, rounds = 36, seed = 0x5EED01,
      schemaOps = true)
  }

  test("MOR + schema evolution/savepoints: 30 rounds match the model") {
    runScenario("mor_ddl", TableType.Mor, rounds = 30, seed = 0x5EED02,
      schemaOps = true)
  }

  // Deeper sweeps on demand: -DmodelcheckSeeds=7,11,13 runs extra seeds
  // per table type (a bug-hunt lever, not part of the default suite cost)
  sys.props.get("modelcheckSeeds").toSeq
    .flatMap(_.split(",")).map(_.trim.toLong).foreach { s =>
      test(s"COW sweep seed=$s") {
        runScenario(s"cow_$s", TableType.Cow, rounds = 30, seed = s,
          schemaOps = true)
      }
      test(s"MOR sweep seed=$s") {
        runScenario(s"mor_$s", TableType.Mor, rounds = 30, seed = s,
          schemaOps = true)
      }
    }
}
