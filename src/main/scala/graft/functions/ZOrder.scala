package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for N numeric dimensions: each dimension
  * is min-max scaled to a fixed bit width and the bits interleaved, so
  * range-clustering on the z-value co-locates rows that are close in EVERY
  * dimension — point/range queries on any clustered column then prune well
  * from per-file min/max stats. Built from shift/or expressions only (no
  * multiplication overflow under ANSI mode), fully codegen'd. */
object ZOrder {

  /** Scale a numeric column to [0, 2^bits). Constant dimensions map to 0. */
  private def scaleBits(c: Column, mn: Double, mx: Double, bits: Int): Column =
    if (mx <= mn) lit(0L)
    else least(lit((1L << bits) - 1),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(((1L << bits) - 1).toDouble))
      .cast("long"))

  /** The interleaved z-value of N dimensions, each given as
    * (column, min, max). Bit width per dimension is min(16, 63/N) so the
    * result always fits a non-negative long. */
  def zValueN(dims: Seq[(Column, Double, Double)]): Column = {
    require(dims.size >= 2, "z-order needs at least 2 dimensions")
    val n = dims.size
    val bits = math.min(16, 63 / n)
    val scaled = dims.map { case (c, mn, mx) => scaleBits(c, mn, mx, bits) }
    (0 until bits).flatMap { b =>
      scaled.zipWithIndex.map { case (s, i) =>
        shiftleft(shiftright(s, b).bitwiseAND(1), n * b + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** The interleaved z-value of (x, y) given each dimension's min/max. */
  def zValue(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double): Column =
    zValueN(Seq((x, xMin, xMax), (y, yMin, yMax)))
}
