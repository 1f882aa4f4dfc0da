package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic FIXED-k centroid sampling shared by the IVF-style
  * operators (s_topk_ivf, s_ivf_incremental, s_knn_graph,
  * s_cluster_quality, d_semdedup) and the PQ codebook (s_topk_pq).
  *
  * The centroid set is the k corpus vectors with the smallest
  * `md5(cast(vec_id as string))` (ties by vec_id) — a pseudo-random but
  * bit-deterministic sample whose SIZE DOES NOT GROW WITH THE CORPUS.
  * The earlier `vec_id % 100 == 0` rule made #centroids = n/100, so the
  * broadcast grew linearly and nearest-centroid assignment cost
  * O(n²/100) — the one remaining quadratic in the ANN family. With a
  * constant k the assignment is O(n·k), the centroid table is a
  * fixed-size broadcast at any corpus size, and Spark evaluates the
  * sample as a single TakeOrderedAndProject pass (per-partition k-heap,
  * no global sort shuffle).
  *
  * Both engines agree bit-for-bit: Spark's `md5` and DuckDB's `md5` emit
  * the same lowercase-hex string for the same decimal rendering of the
  * id, and hex-string ordering is plain byte order in both. The DuckDB
  * mirror of [[sample]] is
  * `SELECT ... FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT k`.
  *
  * At a real 100 TB deployment k becomes a tuning knob (IVF practice:
  * k ≈ √n, refreshed by a bounded-sample k-means as the corpus grows);
  * every operator here takes the sample as a parameter so only the
  * constant changes.
  */
object Centroids {

  /** Default centroid count for the IVF-style operators. */
  val K = 16

  /** Codeword count per PQ subspace (FAISS-style codebooks are fixed at
    * 2^b entries — 256 for 8-bit codes; 64 here keeps the oracle's
    * cross-join cheap at test scale while staying corpus-size-free). */
  val PqK = 64

  /** The hash-rank order: smallest md5 of the decimal id, ties by id. */
  private def hashRank(idCol: String) =
    Seq(asc_nulls_first("_hr"), asc(idCol))

  /** k ids sampled by hash rank — one TakeOrderedAndProject pass. */
  def sampleIds(e: DataFrame, k: Int, idCol: String = "vec_id"): DataFrame =
    e.select(col(idCol), md5(col(idCol).cast("string")).as("_hr"))
      .orderBy(hashRank(idCol): _*)
      .limit(k)
      .select(idCol)

  /** k (vec_id, embedding) centroids as (c_id, ce). */
  def sample(e: DataFrame, k: Int = K): DataFrame =
    e.select(col("vec_id"), col("embedding"),
        md5(col("vec_id").cast("string")).as("_hr"))
      .orderBy(hashRank("vec_id"): _*)
      .limit(k)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"))

  /** The DuckDB mirror of the sampling rule, as a WHERE/ORDER tail to
    * splice into a `FROM e` CTE. */
  def sqlTail(k: Int = K): String =
    s"ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k"
}
