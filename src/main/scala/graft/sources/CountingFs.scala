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

  def inc(op: String): Unit =
    counters.computeIfAbsent(op, _ => new LongAdder).increment()

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
