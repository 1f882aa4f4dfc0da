package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Shared bloom-filter arithmetic — the runtime-filter pattern Spark's own
  * `InjectRuntimeFilter` rule uses for join pruning, here exposed as graft
  * SQL functions so an operator can build the filter from an arbitrary
  * build-side plan and probe it inside whole-stage codegen.
  *
  * Layout contract (both sides MUST agree or false negatives appear):
  * bit position `p` lives in byte `p >>> 3`, bit `p & 7`; hash `i` of key
  * `key` is the TOP `mLog2` bits of `XXH64(key, seed = i)`. The builder
  * aggregates positions into 64-bit words (`word = p >>> 6`, bit
  * `p & 63`), and [[BloomImpl.fill]] writes each word little-endian so the
  * byte/bit view above holds.
  */
object BloomImpl {

  /** Bit position of hash `i` for `key` in a filter of `1 << mLog2` bits. */
  def pos(key: Long, i: Int, mLog2: Int): Long =
    XXH64.hashLong(key, i.toLong) >>> (64 - mLog2)

  /** True iff all `k` hash bits of `key` are set — no false negatives for
    * inserted keys; false positives at the standard `(1-e^{-kn/m})^k` rate. */
  def mightContain(key: Long, bitmap: Array[Byte], k: Int, mLog2: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = pos(key, i, mLog2)
      if ((bitmap((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Write an aggregated (wordIndex, orOfBits) pair into the byte bitmap —
    * little-endian, matching [[mightContain]]'s byte/bit addressing. */
  def fill(bitmap: Array[Byte], word: Long, bits: Long): Unit = {
    var j = 0
    while (j < 8) {
      bitmap(word.toInt * 8 + j) = (bitmap(word.toInt * 8 + j) | ((bits >>> (8 * j)) & 0xffL)).toByte
      j += 1
    }
  }
}

/** `bloom_pos(key, i, mLog2)` — bit position of hash `i` for `key`; the
  * build side explodes `i ∈ [0, k)` and bit-ORs positions into words. */
case class BloomPos(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_pos"

  override protected def nullSafeEval(key: Any, i: Any, mLog2: Any): Any =
    BloomImpl.pos(key.asInstanceOf[Long], i.asInstanceOf[Int], mLog2.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, i, m) =>
      s"${ev.value} = graft.functions.BloomImpl.pos($key, $i, $m);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BloomPos =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `bloom_contains(key, bitmap, k, mLog2)` — codegen'd membership probe.
  * `k`/`mLog2` must be foldable (they parameterize the generated loop). */
case class BloomContains(left: Expression, right: Expression, k: Int, mLog2: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, BinaryType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains"

  override protected def nullSafeEval(key: Any, bitmap: Any): Any =
    BloomImpl.mightContain(
      key.asInstanceOf[Long], bitmap.asInstanceOf[Array[Byte]], k, mLog2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (key, bm) =>
      s"${ev.value} = graft.functions.BloomImpl.mightContain($key, $bm, $k, $mLog2);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  def fromArgs(children: Seq[Expression]): BloomContains = {
    require(children.size == 4, "usage: bloom_contains(key, bitmap, k, mLog2)")
    def intLit(e: Expression, name: String): Int = {
      require(e.foldable, s"bloom_contains $name must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    val k = intLit(children(2), "k")
    val mLog2 = intLit(children(3), "mLog2")
    // mLog2 < 6 would make the bitmap smaller than one 64-bit word (fill
    // writes 8 bytes per word → out-of-bounds); > 30 makes the byte array
    // unaddressable and the top-bits shift degenerate (a 64-bit shift is a
    // no-op on the JVM)
    require(k >= 1 && k <= 16, s"bloom_contains k out of range [1,16]: $k")
    require(mLog2 >= 6 && mLog2 <= 30,
      s"bloom_contains mLog2 out of range [6,30]: $mLog2")
    BloomContains(children.head, children(1), k, mLog2)
  }
}

/** The shared distributed bitmap build + sizing, used by every bloom-probe
  * operator (q_bloom_join, d_seen_filter). */
object BloomBuild {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{array, call_function, col, explode, expr, lit}

  /** ~`bitsPerKey` bits per expected key: mLog2 = ceil(log2(n·bits)),
    * clamped to [12, 26] (512 B to 8 MiB of bitmap). */
  def sizeLog2(nKeys: Long, bitsPerKey: Int = 8): Int =
    math.max(12, math.min(26,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nKeys) * bitsPerKey - 1)))

  /** Build the bitmap from a LongType key column: explode the k positions,
    * bit_or into 64-bit words (one shuffle whose output is ≤ m/64 rows —
    * bounded by the FILTER size, not the data), fill driver-side. This is
    * the same aggregate shape Spark's own InjectRuntimeFilter uses. */
  def build(keys: DataFrame, keyCol: Column, k: Int, mLog2: Int): Array[Byte] = {
    // mLog2 >= 6: the bitmap must hold at least one full 64-bit word,
    // since fill unconditionally writes 8 bytes per word (sizeLog2 already
    // clamps to [12,26]; this guards the direct public-API path)
    require(k >= 1 && k <= 16 && mLog2 >= 6 && mLog2 <= 30,
      s"bloom build parameters out of range: k=$k mLog2=$mLog2")
    val words = keys
      .select(explode(array((0 until k).map(i =>
        call_function("bloom_pos", keyCol, lit(i), lit(mLog2))): _*)).as("p"))
      .selectExpr("shiftright(p, 6) AS w", "shiftleft(1L, CAST(p % 64 AS INT)) AS b")
      .groupBy("w").agg(expr("bit_or(b)").as("bits"))
      .collect()
    val bitmap = new Array[Byte](1 << (mLog2 - 3))
    words.foreach(r => BloomImpl.fill(bitmap, r.getLong(0), r.getLong(1)))
    bitmap
  }
}
