package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native codegen'd dot product of two numeric arrays (the hot scalar of
  * every cosine computation: ANN re-rank, exact top-k, embedding dedup).
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array per row and walks it with interpreted
  * lambda calls; this expression emits a single fused Java loop
  * (`doGenCode`), summing left-to-right in double like the composed form
  * and the DuckDB oracles, so results are bit-identical. Null element or
  * length mismatch → null (zip_with-pad parity).
  *
  * Preference order per the engine brief: built-in functions, then a
  * native `Expression` with codegen — this is the first operator where
  * the built-ins genuinely can't express the semantics efficiently.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arraydot requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = la.numElements()
    if (ra.numElements() != n) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column API: `dot(a, b)` as a native codegen'd expression. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native codegen'd squared euclidean distance `Σ (a_i − b_i)²` — same
  * contract and summation order as [[ArrayDot]] (the KNN hot scalar).
  */
case class ArraySqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arraysqdist requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = la.numElements()
    if (ra.numElements() != n) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = ((double) $a.$getL($i)) - ((double) $b.$getR($i));
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySqDist =
    copy(left = newLeft, right = newRight)
}

object ArraySqDist {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Native codegen'd Minkowski p-power distance `Σ |a_i − b_i|^p` (the
  * pre-root sum — monotone in the true distance, so it is the top-k sort
  * key; take `pow(·, 1/p)` after the bounded top-k when the actual
  * distance is needed, e.g. for distance-weighted KNN votes). `p = 1` and
  * `p = 2` specialize to abs/square (no `Math.pow` on the hot path) —
  * same contract and summation order as [[ArrayDot]].
  */
case class ArrayMinkowskiPow(left: Expression, right: Expression, p: Double)
    extends BinaryExpression {

  require(p >= 1.0, s"minkowski p must be >= 1, got $p")

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"arrayminkowskipow requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (la, ra) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = la.numElements()
    if (ra.numElements() != n) return null
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      val d = x - y
      s += (if (p == 1.0) math.abs(d)
            else if (p == 2.0) d * d
            else math.pow(math.abs(d), p))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val term =
        if (p == 1.0) s"java.lang.Math.abs($d)"
        else if (p == 2.0) s"$d * $d"
        else s"java.lang.Math.pow(java.lang.Math.abs($d), $p)"
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = ((double) $a.$getL($i)) - ((double) $b.$getR($i));
         |    $s += $term;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayMinkowskiPow =
    copy(left = newLeft, right = newRight)
}

object ArrayMinkowskiPow {
  def apply(a: Column, b: Column, p: Double): Column =
    ColumnBridge.column(
      ArrayMinkowskiPow(ColumnBridge.expression(a), ColumnBridge.expression(b), p))
}
