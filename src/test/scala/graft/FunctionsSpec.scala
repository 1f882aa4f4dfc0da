package graft

import graft.dedup.Dedup
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native CosineSim expression: bit-parity with the declarative fold,
  * correct nulls, and whole-stage-codegen participation. */
class FunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = GraftSession.builder("graft-test", "4").getOrCreate()
  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("shingle_hash is bit-identical to the split+transform+xxhash64 formulation") {
    GraftFunctions.register(spark)
    val docs = GraftSession.table(spark, sfDir, "documents").limit(200)
    for (n <- Seq(3, 5)) {
      val legacy = docs.select(col("doc_id"),
          split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " ").as("w"))
        .select(col("doc_id"),
          when(size(col("w")) >= n, array_distinct(expr(
            s"transform(sequence(0, size(w)-$n), i -> xxhash64(${(0 until n).map(j => s"w[i+$j]").mkString(", ")}))")))
            .otherwise(array().cast("array<bigint>")).as("sh"))
      val native = docs.select(col("doc_id"),
        expr(s"shingle_hash(lower(text), $n)").as("sh"))
      assert(native.exceptAll(legacy).isEmpty && legacy.exceptAll(native).isEmpty,
        s"shingle_hash($n) diverges from the legacy formulation")
    }
    // edge inputs: empty, whitespace-only, fewer tokens than n, mixed whitespace
    val edge = spark.sql(
      """SELECT shingle_hash(s, 3) AS sh FROM VALUES
        |  (''), ('   '), ('one two'), ('a\tb\nc  d'), ('x x x x') AS t(s)""".stripMargin)
      .collect().map(_.getSeq[Long](0).length)
    assert(edge.toSeq == Seq(0, 0, 0, 2, 1), edge.toSeq.toString)
  }

  test("cosine_sim is bit-identical to the aggregate/zip_with fold") {
    GraftFunctions.register(spark)
    val e = GraftSession.table(spark, sfDir, "embeddings")
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea")).filter(col("va") < 50)
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb")).filter(col("vb") < 50)
    val pairs = a.join(b, col("va") < col("vb"))
    val mismatches = pairs
      .withColumn("c1", expr("cosine_sim(ea, eb)"))
      .withColumn("c2",
        Dedup.dot(col("ea"), col("eb")) / (Dedup.norm2(col("ea")) * Dedup.norm2(col("eb"))))
      .filter(col("c1") =!= col("c2")) // exact double comparison, no tolerance
      .count()
    assert(mismatches == 0)
  }

  test("l2sq_q6 is bit-identical to the round(aggregate(zip_with)) composition") {
    GraftFunctions.register(spark)
    val e = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val a = e.select(col("vec_id").as("va"), col("v").as("ea")).filter(col("va") < 50)
    val b = e.select(col("vec_id").as("vb"), col("v").as("eb")).filter(col("vb") < 50)
    val mismatches = a.join(b, col("va") < col("vb"))
      .withColumn("n1", expr("l2sq_q6(ea, eb)"))
      .withColumn("n2", expr(
        """cast(round(aggregate(zip_with(ea, eb, (x, c) -> (x - c) * (x - c)),
          |  cast(0.0 as double), (acc, w) -> acc + w) * 1000000) as bigint)""".stripMargin))
      .filter(col("n1") =!= col("n2"))
      .count()
    assert(mismatches == 0)
    // null-intolerant like the composition
    assert(spark.sql("SELECT l2sq_q6(NULL, array(1.0d))").head().isNullAt(0))
  }

  test("cosine_sim null and SQL-registration behavior") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS c, " +
        "cosine_sim(NULL, array(CAST(1.0 AS FLOAT))) AS n").head()
    assert(row.getDouble(0) == 0.0)
    assert(row.isNullAt(1))
  }

  test("cosine_sim runs inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val e = GraftSession.table(spark, sfDir, "embeddings").limit(10)
    val plan = e.selectExpr("cosine_sim(embedding, embedding) AS c")
      .queryExecution.executedPlan
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen stage
    val line = plan.toString.linesIterator.find(_.contains("cosine_sim")).getOrElse("")
    assert(line.trim.stripPrefix("+- ").startsWith("*("),
      s"cosine_sim not inside WholeStageCodegen:\n$plan")
    // and evaluates correctly there: self-cosine == 1.0 (within fp)
    val vals = e.selectExpr("cosine_sim(embedding, embedding) AS c")
      .collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("bloom build/probe: no false negatives, honest FP rate, codegen parity") {
    GraftFunctions.register(spark)
    import graft.functions.BloomImpl
    val k = 4
    val mLog2 = 16 // 65536 bits for 2000 keys ≈ 8 bits/key
    // build a bitmap from even keys 0,2,...,3998 through the DISTRIBUTED
    // path (bloom_pos + word bit_or), exactly as q_bloom_join does
    val keys = spark.range(0, 4000, 2).selectExpr("id AS key")
    val words = keys
      .select(explode(array((0 until k).map(i =>
        call_function("bloom_pos", col("key"), lit(i), lit(mLog2))): _*)).as("p"))
      .selectExpr("shiftright(p, 6) AS w", "shiftleft(1L, CAST(p % 64 AS INT)) AS b")
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .collect()
    val bitmap = new Array[Byte](1 << (mLog2 - 3))
    words.foreach(r => BloomImpl.fill(bitmap, r.getLong(0), r.getLong(1)))
    // probe through the codegen'd expression over all 4000 keys
    val probed = spark.range(0, 4000)
      .withColumn("hit", call_function("bloom_contains",
        col("id"), lit(bitmap), lit(k), lit(mLog2)))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    // NO false negative is acceptable — that would break join exactness
    val falseNeg = probed.filter { case (id, hit) => id % 2 == 0 && !hit }
    assert(falseNeg.isEmpty, s"bloom false negatives: ${falseNeg.take(5).toSeq}")
    // false positives exist but are rare (theory ~2.4% at 8 bits/key, k=4)
    val fp = probed.count { case (id, hit) => id % 2 == 1 && hit }
    assert(fp < 200, s"bloom FP rate implausibly high: $fp/2000")
    // interpreted eval agrees with the codegen'd path bit-for-bit
    probed.foreach { case (id, hit) =>
      assert(BloomImpl.mightContain(id, bitmap, k, mLog2) == hit,
        s"eval/codegen divergence at key $id")
    }
    // mLog2 < 6 means a sub-word bitmap: fill writes 8 bytes per word, so
    // the build must reject it up front rather than AIOOBE mid-job
    intercept[IllegalArgumentException](
      graft.functions.BloomBuild.build(keys, col("key"), k, 5))
  }

  test("byte_sum/byte_sumsq match the reference fold and run inside codegen") {
    GraftFunctions.register(spark)
    import graft.functions.ByteMomentsImpl
    val docs = GraftSession.table(spark, sfDir, "documents").limit(300)
      .selectExpr("doc_id", "CAST(substring(text, 1, 64) AS BINARY) AS p")
    val rows = docs.selectExpr("p", "byte_sum(p) AS s1", "byte_sumsq(p) AS s2").collect()
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]](0)
      assert(r.getLong(1) == ByteMomentsImpl.sum(bytes))
      assert(r.getLong(2) == ByteMomentsImpl.sumSq(bytes))
      assert(r.getLong(1) == bytes.map(b => (b & 0xff).toLong).sum)
      assert(r.getLong(2) == bytes.map(b => { val v = (b & 0xff).toLong; v * v }).sum)
    }
    // unsigned semantics: a 0xFF byte counts 255, not -1
    val hi = spark.sql("SELECT byte_sum(unhex('FF00FF')) AS s, byte_sumsq(unhex('FF00FF')) AS q").head()
    assert(hi.getLong(0) == 510L && hi.getLong(1) == 2 * 255L * 255L)
    // fused into the whole-stage-codegen scan stage
    val plan = docs.selectExpr("byte_sum(p) AS s").queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("byte_sum")).getOrElse("")
    assert("""\*\(\d+\)""".r.findFirstIn(line).isDefined, s"byte_sum not codegen'd:\n$plan")
  }

  test("q_bloom_join's prefilter prunes most non-matching fact rows") {
    GraftFunctions.register(spark)
    import graft.functions.BloomImpl
    // replicate the op's build at sf0.001 and measure the prune: the dim is
    // ~1/5 of orders keys, so bloom should pass ~20% + ~2.4% FP of lineitem
    val dim = GraftSession.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val nKeys = math.max(1L, dim.count())
    val mLog2 = math.max(12, math.min(26,
      64 - java.lang.Long.numberOfLeadingZeros(nKeys * 8 - 1)))
    val words = dim
      .select(explode(array((0 until 4).map(i =>
        call_function("bloom_pos", col("o_orderkey"), lit(i), lit(mLog2))): _*)).as("p"))
      .selectExpr("shiftright(p, 6) AS w", "shiftleft(1L, CAST(p % 64 AS INT)) AS b")
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .collect()
    val bitmap = new Array[Byte](1 << (mLog2 - 3))
    words.foreach(r => BloomImpl.fill(bitmap, r.getLong(0), r.getLong(1)))
    val li = GraftSession.table(spark, sfDir, "lineitem").select("l_orderkey")
    val total = li.count()
    val kept = li.filter(call_function("bloom_contains",
      col("l_orderkey"), lit(bitmap), lit(4), lit(mLog2))).count()
    assert(kept < total / 2, s"bloom pruned too little: kept $kept of $total")
    // every true match survives: semi-join count equals bloom∩exact count
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val keptTrue = li.filter(call_function("bloom_contains",
        col("l_orderkey"), lit(bitmap), lit(4), lit(mLog2)))
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(keptTrue == trueMatches, s"bloom dropped true matches: $keptTrue != $trueMatches")
  }
}
