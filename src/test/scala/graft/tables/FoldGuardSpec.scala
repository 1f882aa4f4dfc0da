package graft.tables

import org.apache.hadoop.fs.Path
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[GraftTable.withFoldGuard]] — the fold-race detector
  * under the index lookups. In-package because the guard is
  * `private[tables]`: the scenario specs (TablesSpec "fold marker" tests)
  * cover the end-to-end contract; these pin the retry/reject mechanics
  * that are hard to trigger deterministically from outside. */
class FoldGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.GraftSession
    .builder("graft-foldguard-test", "4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  private def freshRoot(name: String): (GraftTable, Path, java.io.File) = {
    val dir = s"/tmp/graft_spec/foldguard_$name"
    val tbl = GraftTable(spark, GraftTableConfig(dir, "k", "k"))
    tbl.dropIfExists()
    val root = new java.io.File(s"$dir/idx")
    assert(root.mkdirs())
    (tbl, new Path(root.getAbsolutePath), root)
  }

  test("a transient FileNotFoundException retries and the next attempt's value wins") {
    val (tbl, root, _) = freshRoot("fnf")
    var calls = 0
    val out = tbl.withFoldGuard[Int](root) {
      calls += 1
      if (calls == 1) throw new java.io.FileNotFoundException("dir deleted mid-read")
      Some(7)
    }
    assert(out.contains(7) && calls == 2, s"out=$out calls=$calls")
  }

  test("a dir-set change across the read rejects the attempt (mappings may have moved)") {
    val (tbl, root, rootF) = freshRoot("dirset")
    var calls = 0
    val out = tbl.withFoldGuard[Int](root) {
      calls += 1
      // first attempt mutates the listing mid-"read" — the exact signature
      // of a fold completing inside the lookup's window
      if (calls == 1) assert(new java.io.File(rootF, s"merged-$calls").mkdir())
      Some(calls)
    }
    assert(out.contains(2) && calls == 2,
      s"attempt with a shifting listing must be discarded: out=$out calls=$calls")
  }

  test("a visible fold marker short-circuits to None without evaluating the body") {
    val (tbl, root, rootF) = freshRoot("marker")
    assert(new java.io.File(rootF, "_folding").createNewFile())
    var calls = 0
    val out = tbl.withFoldGuard[Int](root, attempts = 2) { calls += 1; Some(1) }
    assert(out.isEmpty && calls == 0,
      s"marker must force the fallback, not a read: out=$out calls=$calls")
  }

  test("persistent failures exhaust the attempts and fall back to None") {
    val (tbl, root, _) = freshRoot("exhaust")
    var calls = 0
    val out = tbl.withFoldGuard[Int](root, attempts = 3) {
      calls += 1
      throw new java.io.FileNotFoundException(s"always gone ($calls)")
    }
    assert(out.isEmpty && calls == 3, s"out=$out calls=$calls")
  }

  test("a Spark job failure caused by a vanished file retries like a bare FNF") {
    val (tbl, root, _) = freshRoot("sparkfnf")
    var calls = 0
    val wrapped = new org.apache.spark.SparkException("task failed",
      new RuntimeException("stage",
        new java.io.FileNotFoundException("part-0000.parquet")))
    val out = tbl.withFoldGuard[Int](root) {
      calls += 1
      if (calls == 1) throw wrapped
      Some(3)
    }
    assert(out.contains(3) && calls == 2, s"out=$out calls=$calls")
  }
}
