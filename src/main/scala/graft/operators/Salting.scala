package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salting for hot join keys (SURVEY §5) — the manual escape hatch for
  * the case AQE's skew-join split can't fix: AQE splits oversized SHUFFLE
  * PARTITIONS, but when one key's rows must still meet all of the other
  * side's rows for that key, a downstream per-key aggregate or a
  * sort-merge buffer can still concentrate one key in one task. Salting
  * breaks a hot key into `salts` sub-keys: the probe side scatters
  * deterministically, the build side replicates `salts`×.
  *
  * Cost model: build-side rows are duplicated `salts` times — use it with a
  * small-to-medium build side and only when a key is provably hot (the
  * reference's glue benchmark pattern: billions of log lines for a handful
  * of callers). Results are identical to the plain join by construction.
  */
object Salting {

  private val SaltCol = "_graft_salt"

  /** Equi-join `probe` (large, skewed) with `build` on probeKey == buildKey,
    * scattering each probe key across `salts` shuffle sub-keys. The salt is
    * derived from the probe row's content (deterministic, no RNG). Output
    * columns = probe ++ build columns, like a plain inner join. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val p = probe.withColumn(SaltCol,
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salts)))
    val b = build.withColumn(SaltCol,
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    p.join(b, p(probeKey) === b(buildKey) && p(SaltCol) === b(SaltCol))
      .drop(SaltCol)
  }
}
