package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** A Spark [[FileIndex]] served entirely from graft's COMMIT METADATA —
  * the file set and every file's length come from the timeline's
  * [[FileMeta]] rows, so planning a scan costs ZERO filesystem calls
  * (no per-file HEAD, no directory LIST). This is the same move Hudi's
  * metadata table and Delta's transaction log make: on an object store,
  * `spark.read.parquet(file1..fileN)` pays one round-trip per path just
  * to rebuild statuses the table format already committed. graft's
  * commit JSON records `len` at write time (harvested for free from the
  * post-write listing), so the statuses are exact and the files are
  * immutable once committed — a fabricated (length, path) status is as
  * good as a listed one. Modification time is 0: Spark uses it only for
  * cache keys, never for correctness of a one-shot scan.
  *
  * Reference anchor: the reference's Glue benchmark measures exactly the
  * S3-call blowup this removes (per-query listing of data paths). */
private[tables] final class MetaFileIndex(
    paths: Seq[Path], lens: Seq[Long]) extends FileIndex {

  private val statuses: Array[FileStatus] =
    paths.lazyZip(lens).map { (p, l) =>
      new FileStatus(l, false, 1, 0L, 0L, p)
    }.toArray

  override def rootPaths: Seq[Path] = paths
  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses))
  override def inputFiles: Array[String] = paths.map(_.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = lens.sum
  override def partitionSchema: StructType = StructType(Nil)
}

private[tables] object MetaFileIndex {

  /** Parquet scan over `(path, len)` files with an explicit schema and no
    * filesystem metadata calls at plan time. Column pruning, parquet
    * filter pushdown, and `_metadata.file_path` behave exactly as with
    * `spark.read.parquet` — the relation is the same HadoopFsRelation +
    * ParquetFileFormat pair, only the listing is metadata-served. */
  def scan(spark: SparkSession, files: Seq[(Path, Long)],
      schema: StructType): DataFrame = {
    val idx = new MetaFileIndex(files.map(_._1), files.map(_._2))
    val rel = HadoopFsRelation(idx, StructType(Nil), schema, None,
      new ParquetFileFormat(), Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}
