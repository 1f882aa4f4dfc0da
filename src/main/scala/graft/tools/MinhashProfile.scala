package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: phase breakdown of d_minhash_lsh at SPARK_GRAFT_SF_DIR. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mh] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = GraftSession.table(spark, sfDir, "documents")
    time("warmup docs count")(docs.count())

    graft.functions.GraftFunctions.register(spark)
    val sh = docs
      .select(col("doc_id"), explode(expr("shingle_hash(lower(text), 3)")).as("sh"))
      .cache()
    time("shingle cache fill (count)")(println("  rows=" + sh.count()))
    val mhCols = (0 until 64).map(i => min(xxhash64(col("sh"), lit(i))).as(s"mh$i"))
    val mh = sh.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    time("minhash 64-agg (count)")(mh.count())
    time("minhash 64-agg rerun")(mh.count())
    val bandCols = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * 4 until (b + 1) * 4).map(i => col(s"mh$i")): _*).as("sig"))
    }
    val buckets = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.sig"))
      .cache()
    time("bucket cache fill")(buckets.count())
    val cand = buckets.toDF("da", "band", "sig")
      .join(buckets.toDF("db", "band", "sig"), Seq("band", "sig"))
      .filter(col("da") < col("db"))
      .select("da", "db").distinct()
    time("candidate self-join")(println("  cands=" + cand.count()))
    time("full op (graft.dedup)")(
      graft.dedup.Dedup.dMinhashLsh(spark, sfDir).count())
    time("full op rerun")(
      graft.dedup.Dedup.dMinhashLsh(spark, sfDir).count())
    spark.stop()
  }
}
