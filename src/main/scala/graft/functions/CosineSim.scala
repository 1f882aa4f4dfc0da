package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * `cosine_sim(a, b) = dot(a,b) / (||a|| * ||b||)`, all three sums
  * accumulated in index order as doubles — bit-identical to the DuckDB
  * oracle folds used across graft (SURVEY.md §4) and to
  * [[graft.dedup.Dedup.dot]]. A whole-stage-codegen'd primitive loop: no
  * boxing, no lambda dispatch per element (the `functions.aggregate`/
  * `zip_with` formulation allocates an intermediate array and evaluates a
  * lambda per element — this is the hot-path replacement).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv;
         |  $nx += $xv * $xv;
         |  $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** [[CosineSim]] over DOUBLE vectors — same index-ordered double fold, for
  * columns that carry full-precision embeddings (e.g. the dedup corpus with
  * planted double-precision perturbations, Dedup.scala). Kept as a separate
  * expression instead of accepting both types so each loop reads its array
  * with the primitive accessor and codegen stays branch-free. */
case class CosineSimD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim_d"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv;
         |  $nx += $xv * $xv;
         |  $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimD =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: squared L2 distance of two double vectors,
  * QUANTIZED to 1e-6 as a BIGINT — `cast(round(sum((x-y)^2) * 1e6) as
  * bigint)` with the sum accumulated in index order, bit-identical to the
  * `aggregate(zip_with(...))` + `round` composition it replaces (same
  * HALF_UP decimal rounding as Spark's Round) and to the DuckDB oracle
  * folds. The codegen'd primitive loop replaces an interpreted
  * per-element lambda dispatch on the PQ encode hot path. */
case class L2SqQ6(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2sq_q6"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    L2SqQ6.quantize(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = graft.functions.L2SqQ6.quantize($s);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqQ6 =
    copy(left = newLeft, right = newRight)
}

object L2SqQ6 {
  /** Same arithmetic as `cast(round(s * 1e6) as bigint)`: multiply in
    * double, HALF_UP on the canonical decimal form (what Spark's Round
    * does), truncate to long. */
  def quantize(s: Double): Long =
    java.math.BigDecimal.valueOf(s * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
}

/** Native Catalyst expression: inner product of two float vectors, the
  * [[CosineSim]] fold without normalization — the scoring kernel for
  * max-inner-product retrieval (recommender/two-tower scoring), where
  * magnitude IS signal and cosine's normalization would erase it. Same
  * index-ordered double accumulation as the DuckDB oracle fold. */
case class DotF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (children => CosineSim(children.head, children(1))),
    "cosine_sim_d" -> (children => CosineSimD(children.head, children(1))),
    "l2sq_q6" -> (children => L2SqQ6(children.head, children(1))),
    "dot_f" -> (children => DotF(children.head, children(1))),
    "shingle_hash" -> (children => ShingleHash.fromArgs(children)),
    "bloom_pos" -> (children => BloomPos(children.head, children(1), children(2))),
    "bloom_contains" -> (children => BloomContains.fromArgs(children)),
    "byte_sum" -> (children => ByteSum(children.head)),
    "byte_sumsq" -> (children => ByteSumSq(children.head)))

  /** `graft_table_changes(path, mode, beginExclusive[, endInclusive])` —
    * the SQL table function mirroring the reference's `hudi_table_changes`
    * (quickstart.sql:83-90): mode `latest_state` returns the latest state
    * of rows changed in the commit range; mode `cdc` returns change images
    * with `_change_type`. Instants may be given as bare numbers (padded
    * automatically). Arguments must be literals — the plan is built at
    * analysis time. */
  private[functions] def tableChangesPlan(
      children: Seq[Expression]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(children.size == 3 || children.size == 4,
      "usage: graft_table_changes(path, 'latest_state'|'cdc', begin[, end])")
    val args = children.map { e =>
      val v = e.eval()
      require(v != null, "graft_table_changes arguments must be non-null literals")
      v.toString
    }
    def instant(s: String): String =
      if (s.equalsIgnoreCase("earliest")) graft.tables.Timeline.pad(0L) // hudi_table_changes parity
      else if (s.forall(_.isDigit)) graft.tables.Timeline.pad(s.toLong)
      else s
    val spark = SparkSession.active
    val cfg = graft.tables.TableProperties.load(spark, args(0)).getOrElse(
      throw new IllegalArgumentException(s"no graft table at ${args(0)}"))
    val table = graft.tables.GraftTable(spark, cfg)
    val begin = instant(args(2))
    val end = if (args.size == 4) instant(args(3)) else graft.tables.Timeline.MaxInstant
    val df = args(1).toLowerCase match {
      case "latest_state" => table.incremental(begin, end)
      case "cdc" => table.cdc(begin, end)
      case other => throw new IllegalArgumentException(
        s"unknown graft_table_changes mode '$other' (latest_state | cdc)")
    }
    df.queryExecution.analyzed
  }

  private val tableChangesInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, "graft_table_changes")

  /** Idempotently register graft functions on an existing session (the
    * runtime path — works on any session, e.g. the driver's). */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSim].getName, name),
        builder)
    }
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier("graft_table_changes"), tableChangesInfo, tableChangesPlan _)
  }
}

/** SessionExtensions injector — the config-driven path:
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  * Injects the graft SQL functions AND the UPDATE/MERGE rewrite rule for
  * graft-catalog tables (see graft.sources.GraftDmlRule). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      children => CosineSim(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_d"),
      new ExpressionInfo(classOf[CosineSimD].getName, "cosine_sim_d"),
      children => CosineSimD(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("l2sq_q6"),
      new ExpressionInfo(classOf[L2SqQ6].getName, "l2sq_q6"),
      children => L2SqQ6(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[DotF].getName, "dot_f"),
      children => DotF(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hash"),
      new ExpressionInfo(classOf[ShingleHash].getName, "shingle_hash"),
      children => ShingleHash.fromArgs(children)))
    ext.injectFunction((
      FunctionIdentifier("bloom_pos"),
      new ExpressionInfo(classOf[BloomPos].getName, "bloom_pos"),
      children => BloomPos(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
      children => BloomContains.fromArgs(children)))
    ext.injectFunction((
      FunctionIdentifier("byte_sum"),
      new ExpressionInfo(classOf[ByteSum].getName, "byte_sum"),
      children => ByteSum(children.head)))
    ext.injectFunction((
      FunctionIdentifier("byte_sumsq"),
      new ExpressionInfo(classOf[ByteSumSq].getName, "byte_sumsq"),
      children => ByteSumSq(children.head)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "graft_table_changes"),
      children => GraftFunctions.tableChangesPlan(children)))
    ext.injectResolutionRule(session => graft.sources.GraftDmlRule(session))
  }
}
