package graft

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the approximate (rows-only-oracle) operators that DuckDB
  * can't check: LSH recall, SimHash banding, IVF recall, multimodal decode
  * plumbing. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
  private val sfSmall = "/root/testdata/sf0.001"
  private val sfDup = "/root/testdata/sf0.1" // only sf with exact-dup documents

  override def afterAll(): Unit = spark.stop()

  test("minhash-LSH recovers every high-jaccard pair (recall on near-dups)") {
    val exact = Dedup.dNgramJaccard(spark, sfDup)
      .filter(col("jac") >= 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dMinhashLsh(spark, sfDup)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data has no near-dup pairs — spec is vacuous")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  test("minhash-LSH output is a subset of the exact jaccard pairs (no false positives)") {
    val exact = Dedup.dNgramJaccard(spark, sfDup)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.dMinhashLsh(spark, sfDup)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("embedding LSH finds every planted near-dup with a sub-quadratic candidate set") {
    val out = Dedup.dEmbedLsh(spark, sfSmall).collect()
    val nPlanted = GraftSession.table(spark, sfSmall, "embeddings")
      .filter(col("vec_id") % 10 === 0).count()
    assert(out.length == nPlanted, s"expected $nPlanted planted pairs, got ${out.length}")
    assert(out.forall(_.getDouble(2) >= 0.95))
    // every pair is (original, its planted copy)
    assert(out.forall(r => r.getLong(1) == r.getLong(0) + 100000L))
  }

  test("simhash finds exact-dup documents at hamming distance 0") {
    val dups = Dedup.dExact(spark, sfDup).filter(col("n_copies") > 1)
    assert(dups.count() > 0)
    val sim = Dedup.dSimhash(spark, sfDup).filter(col("hd") === 0).count()
    assert(sim >= dups.count(), s"simhash found $sim hd=0 pairs")
  }

  test("IVF top-k achieves reasonable recall vs brute force and is deterministic") {
    val bf = Ann.sTopkBruteforce(spark, sfSmall)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = Ann.sTopkIvf(spark, sfSmall)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf2 = Ann.sTopkIvf(spark, sfSmall)
      .select("q_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf1 == ivf2, "IVF result not deterministic")
    val recall = (bf & ivf1).size.toDouble / bf.size
    assert(recall >= 0.2, s"IVF recall $recall vs brute force")
  }

  test("multimodal decode runs per-partition and yields the typed schema") {
    val media = Multimodal.mediaTable(spark, sfSmall).repartition(3)
    val decoded = Multimodal.decodeMeta(spark, media)
    assert(decoded.columns.toSeq == Seq("doc_id", "width", "height", "channels"))
    assert(decoded.count() == media.count())
    // deterministic fake decode: joinable back to the SQL-checkable variant
    val meta = Multimodal.mBinaryMeta(spark, sfSmall)
    val joined = decoded.join(meta, "doc_id")
      .filter(col("width") =!= col("fake_width") || col("height") =!= col("fake_height"))
    assert(joined.count() == 0)
  }
}
