package graft.tables

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** An interrupt landing mid-write (a service's close(), a shutdown hook)
  * must clean its reservation up like any other failed mutation: without
  * it the `.inflight` leaks with a dead renewer and no tombstone — a
  * ghost writer every fold source-filter and reader treats as live until
  * an orphan reaper happens to run (observed live in the multiproc
  * services arm: close() interrupting an in-flight compaction left
  * 000000005.inflight behind). InterruptedException is outside Scala's
  * NonFatal, so the standard cleanup catch never saw it. */
class ReservationInterruptSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.GraftSession
    .builder("graft-reservation-test", "4").getOrCreate()
  override def afterAll(): Unit = spark.stop()

  test("an interrupt mid-write tombstones the reservation and re-asserts the flag") {
    val root = "/tmp/graft_spec/resv_interrupt"
    val tbl = GraftTable(spark, GraftTableConfig(root, "id", "id",
      recordIndexBuckets = 2))
    tbl.dropIfExists()
    tbl.insert(spark.range(100L).selectExpr("id"), numFiles = 1)

    var reserved: String = null
    val thrown = intercept[InterruptedException] {
      tbl.withReservedInstant { instant =>
        reserved = instant
        // simulate shutdown wreckage surfacing from inside the write
        throw new InterruptedException("service close() mid-write")
      }
    }
    assert(thrown.getMessage.contains("mid-write"))
    // cleanup ran: no .inflight ghost, a tombstone fences the number
    assert(!new java.io.File(s"$root/_graft/$reserved.inflight").exists(),
      "interrupted reservation leaked its .inflight")
    assert(new java.io.File(s"$root/_graft/$reserved.rolledback").exists(),
      "interrupted reservation was not tombstoned")
    // the interrupt flag is re-asserted for the caller (cleared here so
    // the rest of the suite is unaffected)
    assert(Thread.interrupted(), "interrupt flag swallowed by the cleanup")
    // the table moves on: no stale reservation blocks folds or reaping,
    // and the next write gets a fresh number past the tombstone
    assert(tbl.timeline.inflightReservations().isEmpty)
    tbl.upsert(spark.range(5L).selectExpr("id"))
    assert(tbl.read().count() == 100L)
    assert(tbl.timeline.latestInstant().exists(_.toLong > reserved.toLong))
    tbl.dropIfExists()
  }
}
