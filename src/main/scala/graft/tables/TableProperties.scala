package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Persistent table configuration in `_graft/config.json` — the analogue of
  * Hudi's `hoodie.properties`: written on table creation so readers (and
  * the `format("graft")` source) never need the key/type/partition options
  * re-specified. */
object TableProperties {

  private val mapper = new ObjectMapper()

  private def path(tablePath: String) = new Path(s"$tablePath/_graft/config.json")

  /** Replace `p` atomically via temp + rename: a concurrent reader sees the
    * old content or the new, never a half-written file. (On local disk
    * rename(2) overwrites the destination in one step; on stores whose
    * rename refuses an existing destination we delete-then-rename, which
    * narrows the window to a brief not-exists that readers treat as None —
    * the same trade Hudi's hoodie.properties backup dance makes.) */
  private[tables] def atomicWrite(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent, s".tmp-${p.getName}-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    var attempts = 0
    while (!fs.rename(tmp, p)) {
      attempts += 1
      // Losing the rename to an IDENTICAL concurrent write is success —
      // e.g. N writer handles all persist the same config.json on their
      // first commit (ConcurrencyStress hit the old single-shot
      // delete+rename losing twice in a row at 8 writers and throwing).
      val same =
        try {
          val in = fs.open(p)
          val cur = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
          java.util.Arrays.equals(cur, bytes)
        } catch { case _: java.io.IOException => false }
      if (same) { fs.delete(tmp, false); return }
      if (attempts >= 5) {
        fs.delete(tmp, false)
        throw new IllegalStateException(s"could not atomically replace $p")
      }
      fs.delete(p, false)
    }
  }

  private def keyGenToString(k: KeyGen): String = k match {
    case NoPartition => "none"
    case FieldPartition(f) => s"field:$f"
    case TimestampDayPartition(f, out, fmt) => s"tsday:$f:$out:$fmt"
  }

  private def keyGenFromString(s: String): KeyGen = s.split(":", -1) match {
    case Array("none") => NoPartition
    case Array("field", f) => FieldPartition(f)
    case Array("tsday", f, out, fmt) => TimestampDayPartition(f, out, fmt)
    case other => throw new IllegalArgumentException(s"bad keygen spec: ${other.mkString(":")}")
  }

  def save(spark: SparkSession, cfg: GraftTableConfig): Unit = {
    val fs = new Path(cfg.path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root: ObjectNode = mapper.createObjectNode()
    root.put("keyField", cfg.keyField)
    root.put("precombineField", cfg.precombineField)
    root.put("keyGen", keyGenToString(cfg.keyGen))
    root.put("numBuckets", cfg.numBuckets)
    root.put("writeChangelog", cfg.writeChangelog)
    root.put("tableType", cfg.tableType)
    val sc = root.putArray("statsCols")
    cfg.statsCols.foreach(sc.add)
    root.put("recordIndexBuckets", cfg.recordIndexBuckets)
    val si = root.putArray("secondaryIndexCols")
    cfg.secondaryIndexCols.foreach(si.add)
    atomicWrite(fs, path(cfg.path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
  }

  private def schemaPath(tablePath: String) = new Path(s"$tablePath/_graft/schema.json")

  /** Persist the table's user-visible schema (what `read()` returns) —
    * written before each data write, so the streaming source can resolve a
    * schema even for a table with no committed data yet. */
  def saveSchema(spark: SparkSession, tablePath: String, schema: StructType): Unit = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    atomicWrite(fs, schemaPath(tablePath), schema.json.getBytes("UTF-8"))
  }

  def loadSchema(spark: SparkSession, tablePath: String): Option[StructType] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = schemaPath(tablePath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      Some(DataType.fromJson(new String(bytes, "UTF-8")).asInstanceOf[StructType])
    }
  }

  def load(spark: SparkSession, tablePath: String): Option[GraftTableConfig] = {
    val fs = new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = path(tablePath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      val n = mapper.readTree(new String(bytes, "UTF-8"))
      Some(GraftTableConfig(
        path = tablePath,
        keyField = n.get("keyField").asText(),
        precombineField = n.get("precombineField").asText(),
        keyGen = keyGenFromString(n.get("keyGen").asText()),
        numBuckets = n.get("numBuckets").asInt(),
        writeChangelog = n.get("writeChangelog").asBoolean(),
        tableType = n.get("tableType").asText(),
        statsCols = Option(n.get("statsCols")).map { arr =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          arr.forEach(e => b += e.asText())
          b.toSeq
        }.getOrElse(Nil),
        recordIndexBuckets =
          Option(n.get("recordIndexBuckets")).map(_.asInt()).getOrElse(0),
        secondaryIndexCols = Option(n.get("secondaryIndexCols")).map { arr =>
          val b = scala.collection.mutable.ArrayBuffer.empty[String]
          arr.forEach(e => b += e.asText())
          b.toSeq
        }.getOrElse(Nil)))
    }
  }
}
