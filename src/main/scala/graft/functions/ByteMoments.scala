package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Integer moment kernels over a binary payload — the per-row work of a
  * dataset-normalization pass (channel mean/std constants computed before
  * training). Exact BIGINT sums so the aggregate is engine-independent:
  * mean/std are derived by the CONSUMER from (n, Σx, Σx²), never summed as
  * floating point inside the engine. Unsigned byte semantics (0..255).
  * Codegen'd tight loops — a HOF chain here would be CodegenFallback and
  * allocate per row (the m_audio_windows lesson). */
object ByteMomentsImpl {
  def sum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
    s
  }

  def sumSq(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { val v = (bytes(i) & 0xff).toLong; s += v * v; i += 1 }
    s
  }
}

/** `byte_sum(binary)` — Σ of unsigned byte values. */
case class ByteSum(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_sum"

  override protected def nullSafeEval(b: Any): Any =
    ByteMomentsImpl.sum(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ByteMomentsImpl.sum($b)")

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

/** `byte_sumsq(binary)` — Σ of squared unsigned byte values. */
case class ByteSumSq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_sumsq"

  override protected def nullSafeEval(b: Any): Any =
    ByteMomentsImpl.sumSq(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.ByteMomentsImpl.sumSq($b)")

  override protected def withNewChildInternal(newChild: Expression): ByteSumSq =
    copy(child = newChild)
}
