package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenize-and-hash for the shingle-based dedup/text family
  * (d_ngram_jaccard, d_minhash_lsh, d_containment, x_decontaminate,
  * x_source_overlap, …).
  *
  * `shingle_hash(s, n)` returns the DISTINCT 64-bit hashes of every
  * n-word shingle of `s`, where words are maximal runs of non-whitespace
  * characters (whitespace = the ASCII class of Java regex `\s`, i.e.
  * exactly what `regexp_replace(s, '\s+', ' ')` collapses). Each shingle
  * hash is the seed-chained XXH64 of the n token byte slices with initial
  * seed 42 — BIT-IDENTICAL to `xxhash64(w[i], …, w[i+n-1])` over
  * `split(lower(trim(regexp_replace(text,'\s+',' '))), ' ')`, the
  * formulation this replaces. That formulation walked the text with the
  * regex engine, allocated the word array, then evaluated an interpreted
  * higher-order `transform` lambda per shingle (HOFs are CodegenFallback)
  * plus an `array_distinct` pass; this expression scans the UTF-8 bytes
  * once, hashes token slices in place (no token strings ever
  * materialize), and dedupes as it goes — cutting the shingle-stream
  * materialization that dominates d_minhash_lsh's cold run.
  *
  * ASCII whitespace bytes cannot occur inside multi-byte UTF-8 sequences,
  * so byte-level scanning tokenizes identically to character-level regex.
  *
  * `n` is a compile-time constant of the operator (3 for the dedup
  * shingles, 5 for decontamination), not a data-dependent value — it is
  * captured at function-resolution time from a literal argument.
  */
case class ShingleHash(child: Expression, nGram: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(nGram >= 1, "shingle_hash n-gram size must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hash"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashImpl.compute(input.asInstanceOf[UTF8String], nGram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashImpl.compute($c, $nGram);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {
  /** Registry builder: `shingle_hash(str, n)` with n a literal int. */
  def fromArgs(children: Seq[Expression]): ShingleHash = {
    require(children.size == 2, "usage: shingle_hash(str, nGramLiteral)")
    val n = children(1) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"shingle_hash n-gram size must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "shingle_hash n-gram size must be a literal")
    }
    ShingleHash(children.head, n)
  }
}

object ShingleHashImpl {

  private final val Seed = 42L

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Distinct n-token shingle hashes, first-occurrence order. */
  def compute(s: UTF8String, nGram: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // token spans (byte start/end), grown geometrically
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.getByte(i))) i += 1
      if (i < n) {
        val st = i
        while (i < n && !isSpace(s.getByte(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = st
        ends(nTok) = i
        nTok += 1
      }
    }
    if (nTok < nGram) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](nTok * 2)
    val out = new Array[Long](nTok - nGram + 1)
    var m = 0
    var t = 0
    while (t <= nTok - nGram) {
      var h = Seed
      var j = t
      while (j < t + nGram) {
        h = XXH64.hashUnsafeBytes(base, off + starts(j), ends(j) - starts(j), h)
        j += 1
      }
      if (seen.add(h)) { out(m) = h; m += 1 }
      t += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
}
