package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for two numeric dimensions: each dimension
  * is min-max scaled to 16 bits and the bits interleaved, so range-
  * clustering on the z-value co-locates rows that are close in BOTH
  * dimensions — point/range queries on either column then prune well from
  * per-file min/max stats. Built from shift/or expressions only (no
  * multiplication overflow under ANSI mode), fully codegen'd. */
object ZOrder {

  private val Bits = 16

  /** Scale a numeric column to [0, 2^16). Constant dimensions map to 0. */
  private def scale16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(lit((1 << Bits) - 1),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit((1 << Bits) - 1)))
      .cast("long")

  /** The interleaved z-value of (x, y) given each dimension's min/max. */
  def zValue(x: Column, xMin: Double, xMax: Double,
      y: Column, yMin: Double, yMax: Double): Column = {
    val xi = scale16(x, xMin, xMax)
    val yi = scale16(y, yMin, yMax)
    (0 until Bits).map { b =>
      shiftleft(shiftright(xi, b).bitwiseAND(1), 2 * b)
        .bitwiseOR(shiftleft(shiftright(yi, b).bitwiseAND(1), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))
  }
}
