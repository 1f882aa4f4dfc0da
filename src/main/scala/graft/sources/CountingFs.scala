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
    val t0 = System.nanoTime()
    try body finally {
      phaseLabel = prev
      // wall attribution rides along for dev profiling (phaseWall): which
      // commit phase pays in TIME, not just FS calls — two nanoTime reads,
      // negligible against any phase body
      phaseNanos.computeIfAbsent(name, _ => new LongAdder)
        .add(System.nanoTime() - t0)
    }
  }

  private val phaseNanos = new ConcurrentHashMap[String, LongAdder]()

  /** Cumulative wall seconds spent inside each [[withPhase]] body (dev
    * profiling; phases nest rarely and briefly, so outer phases include
    * inner time — read alongside the call counters). */
  def phaseWall(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    phaseNanos.asScala.map { case (k, v) => k -> v.sum() / 1e9 }.toMap
  }

  def phaseWallReset(): Unit = phaseNanos.clear()

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
/** RawLocalFileSystem with a pure-Java chmod. Without libhadoop.so (not
  * shipped in the Spark dist this sandbox runs), Hadoop's setPermission
  * FORKS a `chmod` subprocess — and RawLocalFileSystem.create/mkdirs call
  * setPermission for every file and directory, so every commit paid
  * several process forks (sampled live in the commit path as
  * Shell.runCommand frames). java.nio sets POSIX permissions in-process.
  * A LOCAL artifact fix, same class as the checksum-layer disable below:
  * no object store forks processes and real clusters ship the native lib. */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  private def nioChmod(file: java.io.File, permission: FsPermission): Unit = {
    import java.nio.file.attribute.PosixFilePermission._
    val bits = permission.toShort
    val perms = java.util.EnumSet.noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
    val order = Seq(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
      GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
      OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
    order.zipWithIndex.foreach { case (perm, i) =>
      if ((bits & (1 << i)) != 0) perms.add(perm)
    }
    java.nio.file.Files.setPosixFilePermissions(file.toPath, perms)
  }

  override def setPermission(p: Path, permission: FsPermission): Unit =
    nioChmod(pathToFile(p), permission)

  /** Route the permissioned create through the permissionless native path
    * plus an in-process chmod: Hadoop's LocalFSFileOutputStream otherwise
    * calls the STATIC FileUtil.setPermission (a `chmod` fork per file).
    * Semantics match Hadoop's own fallback: create, then chmod. */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val out = create(f, overwrite, bufferSize, replication, blockSize, progress)
    if (permission != null) nioChmod(pathToFile(f), permission)
    out
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val out = super.createNonRecursive(f, null, overwrite, bufferSize,
      replication, blockSize, progress)
    if (permission != null) nioChmod(pathToFile(f), permission)
    out
  }

  /** Same fork-avoidance for directories: mkOneDirWithMode otherwise runs
    * FileUtil.chmod (another subprocess) for every permissioned mkdir. */
  override def mkOneDirWithMode(p: Path, p2f: java.io.File,
      permission: FsPermission): Boolean = {
    val ok = p2f.mkdir()
    if (ok && permission != null) nioChmod(p2f, permission)
    ok
  }

  /** Statuses with permissions PRE-FILLED via one in-process NIO read.
    * Hadoop's lazy DeprecatedRawLocalFileStatus forks `ls -ld` the first
    * time getPermission()/getOwner() is called — and LocatedFileStatus's
    * constructor calls getPermission, so every FileSystem.listFiles /
    * listLocatedStatus (Spark's InMemoryFileIndex listing, the commit
    * path's recursive harvest listing) forked one subprocess PER FILE
    * (sampled live: the dominant fork class in the commit path). */
  private def withNioPerms(s: FileStatus): FileStatus = try {
    val attrs = java.nio.file.Files.readAttributes(
      pathToFile(s.getPath).toPath,
      classOf[java.nio.file.attribute.PosixFileAttributes],
      java.nio.file.LinkOption.NOFOLLOW_LINKS)
    import java.nio.file.attribute.PosixFilePermission._
    val order = Seq(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
      GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
      OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
    var bits = 0
    val ps = attrs.permissions()
    order.zipWithIndex.foreach { case (perm, i) =>
      if (ps.contains(perm)) bits |= (1 << i)
    }
    new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, new FsPermission(bits.toShort),
      attrs.owner().getName, attrs.group().getName, null, s.getPath)
  } catch { case _: Exception => s }

  override def getFileStatus(f: Path): FileStatus =
    withNioPerms(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(withNioPerms)
}

class CountingLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem) {
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
