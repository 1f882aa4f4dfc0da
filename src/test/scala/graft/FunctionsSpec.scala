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
}
