package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Process-global filesystem-call counters behind
  * [[CountingLocalFileSystem]]. Call counts — not wall time — are the
  * scale truth local benchmarks hide: on an object store every
  * list/open/rename is a metered round-trip, and the reference dedicates
  * a whole Glue benchmark suite to exactly this (S3 call blowup on
  * metadata-heavy tables). graft's SURVEY §3 claims "no LIST storms";
  * these counters turn that claim into pinned numbers (FsCallSpec) and
  * per-op `fs` rows in BENCH_SELF.json.
  *
  * local[*] note: executors share the JVM, so the counters see
  * driver + task calls together — exactly the per-op total an object
  * store would bill. On a real cluster each executor would count its own
  * share; the per-op DELTA shape (flat vs O(#files)) is what the pins
  * assert, and that shape is machine-independent. */
object FsCalls {
  private val counters = new ConcurrentHashMap[String, LongAdder]()

  /** Current attribution phase: while nonempty AND [[enablePhases]] was
    * called, every call ALSO counts under `p:<phase>/<op>` — the per-phase
    * breakdown S3CostModel needs to say WHICH part of a commit pays the
    * metadata bill (write job vs footer harvest vs index write vs
    * timeline). Process-global on purpose: in local mode executor task
    * threads share the JVM, and a driver-set phase attributes their calls
    * to the enclosing step — exactly the accounting an object store's
    * bill would show. OPT-IN (S3CostModel/FsTraceProbe call
    * enablePhases()): consumers that SUM a delta (FsCallSpec pins, Bench's
    * per-op fs metric) would otherwise double-count every phased call. */
  @volatile private var phaseLabel: String = ""
  @volatile private var phasesOn: Boolean = false

  def enablePhases(): Unit = phasesOn = true

  /** For tests that enable phases around one pin: phased counting is
    * process-global, and a later consumer that SUMS a delta would
    * double-count every phased call. */
  def disablePhases(): Unit = phasesOn = false

  def withPhase[T](name: String)(body: => T): T = {
    val prev = phaseLabel
    phaseLabel = name
    try body finally phaseLabel = prev
  }

  /** When `GRAFT_FS_TRACE=<op>` is set (diagnostics only — never in a
    * timed run), every call of that class records its call stack; dump
    * with [[traceTop]]. This is how the round-14 commit-bill work found
    * WHICH code path paid each status/list class. */
  private val traceOp: String = sys.env.getOrElse("GRAFT_FS_TRACE", "")
  private val traces = new ConcurrentHashMap[String, LongAdder]()

  def traceReset(): Unit = traces.clear()

  def traceTop(n: Int): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    traces.asScala.map { case (k, v) => k -> v.sum() }.toSeq
      .sortBy(-_._2).take(n)
  }

  def inc(op: String): Unit = {
    counters.computeIfAbsent(op, _ => new LongAdder).increment()
    val ph = phaseLabel
    if (phasesOn && ph.nonEmpty)
      counters.computeIfAbsent(s"p:$ph/$op", _ => new LongAdder).increment()
    if (op == traceOp) {
      val frames = Thread.currentThread().getStackTrace
        .drop(3).take(14).map(_.toString)
        .filterNot(f => f.startsWith("java.") || f.startsWith("jdk."))
        .mkString(" <- ")
      traces.computeIfAbsent(frames, _ => new LongAdder).increment()
    }
  }

  def snapshot(): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    counters.asScala.map { case (k, v) => k -> v.sum() }.toMap
  }

  /** Nonzero per-op deltas since `before` (a prior [[snapshot]]). */
  def delta(before: Map[String, Long]): Map[String, Long] =
    snapshot().map { case (k, v) => k -> (v - before.getOrElse(k, 0L)) }
      .filter(_._2 != 0L)

  def reset(): Unit = counters.clear()
}

/** A drop-in `file://` filesystem that counts every metadata/data call
  * before delegating to [[LocalFileSystem]] — functionally identical,
  * observationally metered. Registered the same way Spark's own test
  * harness registers DebugFilesystem:
  * `spark.hadoop.fs.file.impl = graft.sources.CountingLocalFileSystem`
  * (Bench does this for per-op accounting; FsCallSpec for the hot-path
  * pins). The counted surface is the object-store cost model: list
  * (LIST), status (HEAD), open (GET), create (PUT), rename/delete/mkdirs
  * (mutations). Calls Hadoop internally routes around the FileSystem API
  * are invisible — counts are a floor, which only strengthens an
  * O(1)/flatness pin. */
class CountingLocalFileSystem extends LocalFileSystem {
  import FsCalls.inc

  /** Disable the local CHECKSUM layer: LocalFileSystem wraps every file
    * in a `.crc` shadow — each open pays a getFileStatus in the checker
    * init, each footer seek a getContentSummary→getFileStatus, each
    * vectored row-group read another (stack-traced: ~3 extra HEADs per
    * file read). No object store has this layer, so metering it would
    * overbill every read ~3× relative to the S3 cost the counts model;
    * data integrity still has parquet's own page-level checksums. */
  override def initialize(name: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setVerifyChecksum(false)
    setWriteChecksum(false)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    inc("list"); super.listStatus(f)
  }
  override def listLocatedStatus(f: Path): RemoteIterator[LocatedFileStatus] = {
    inc("list"); super.listLocatedStatus(f)
  }
  override def globStatus(pathPattern: Path): Array[FileStatus] = {
    inc("glob"); super.globStatus(pathPattern)
  }
  override def getFileStatus(f: Path): FileStatus = {
    inc("status"); super.getFileStatus(f)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    inc("open"); super.open(f, bufferSize)
  }
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    inc("create")
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    inc("append"); super.append(f, bufferSize, progress)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    inc("rename"); super.rename(src, dst)
  }
  override def delete(f: Path, recursive: Boolean): Boolean = {
    inc("delete"); super.delete(f, recursive)
  }
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    inc("mkdirs"); super.mkdirs(f, permission)
  }
}
