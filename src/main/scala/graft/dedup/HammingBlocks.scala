package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalable candidate blocking for Hamming-distance self-joins over 64-bit
  * signatures (SimHash, perceptual hashes) — the multi-block pigeonhole of
  * Manku et al., "Detecting Near-Duplicates for Web Crawling", WWW'07 §3.
  *
  * The naive pigeonhole for hd<=3 splits the signature into 4 chunks of 16
  * bits and joins on any equal chunk. That is exhaustive, but the candidate
  * key space is only 2^16 per chunk, so ACCIDENTAL collisions grow as
  * n^2 / 2^16 — invisible at 10^5 docs, quadratic disaster at 10^7+. The
  * fix is not wider chunks (4 chunks covering 64 bits cannot be wider) but
  * MORE blocks joined in COMBINATION: split into 6 blocks (11,11,11,11,10,
  * 10 bits); 3 bit flips can touch at most 3 blocks, so any pair within
  * hd<=3 shares at least one of the C(6,3)=20 ordered 3-block subsets
  * intact. Joining on (subset id, the 3 block values) is therefore still
  * EXHAUSTIVE for hd<=3, while the key carries 32-33 signature bits:
  * accidental collisions drop to ~20 * n^2 / 2^32 — ~2^16x fewer. The cost
  * is 20 exploded rows per doc instead of 4 (a 5x constant on shuffle
  * volume) — the right trade everywhere past toy scale. Past ~10^8 items
  * the knob is more blocks again (8 blocks / C(8,3)=56 combos carries ~40
  * key bits); the combo table is the only thing that changes.
  *
  * Output-compatible by construction: callers verify candidates with the
  * exact bit_count(xor) <= 3 filter, so WHICH exhaustive blocking found a
  * candidate never shows in the result — the DuckDB oracles keep stating
  * the cheapest exhaustive form (4x16) over the same pair semantics. */
object HammingBlocks {
  private val offsets = Array(0, 11, 22, 33, 44, 54)
  private val widths = Array(11, 11, 11, 11, 10, 10)

  /** All 3-of-6 block index subsets, in a fixed order (the combo id). */
  val combos: Seq[(Int, Int, Int)] =
    for (i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6) yield (i, j, k)

  /** The 20 packed candidate keys of a 64-bit signature column: block
    * values at 11-bit stride (every block is <= 11 bits wide) + the combo
    * id above bit 33 — one LongType key per combo, so the candidate join
    * is a single-column equi-join. Arithmetic shiftright is safe: the
    * mask keeps only the block's own bits. */
  def comboKeys(sh: Column): Column = {
    def block(b: Int): Column =
      shiftright(sh, offsets(b)).bitwiseAND(lit((1L << widths(b)) - 1))
    array(combos.zipWithIndex.map { case ((i, j, k), id) =>
      block(i)
        .bitwiseOR(shiftleft(block(j), 11))
        .bitwiseOR(shiftleft(block(k), 22))
        .bitwiseOR(shiftleft(lit(id.toLong), 33))
    }: _*)
  }
}
