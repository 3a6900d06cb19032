package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Runtime kernels for the vector expressions. Static-reachable so the
  * generated code calls them directly and the expressions stay inside
  * whole-stage codegen (same pattern as [[IpUtil]]).
  *
  * Every loop is a *sequential index-order* accumulation (`acc += v_i`
  * from i=0), not a tree reduction: floating-point addition isn't
  * associative, and the index-order sum is bit-identical to the DuckDB
  * oracle's `list_reduce(list_prepend(0.0, ...))` fold — so cosine
  * scores hash-match exactly with no rounding slop. The `isFloat`
  * flags are loop-invariant (JIT-hoisted); elements widen float→double
  * before multiplying, matching the oracle's per-element CAST.
  *
  * Length handling: iterates min(|a|,|b|); all embedding columns are
  * fixed Dim=64. Null elements read as 0.0 (embeddings never carry
  * null elements; the HOF shape this replaced returned null — callers
  * own that invariant).
  */
object VecUtil {

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += get(a, i, aF) * get(b, i, bF); i += 1 }
    s
  }

  def normSq(a: ArrayData, aF: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val v = get(a, i, aF); s += v * v; i += 1 }
    s
  }

  def norm(a: ArrayData, aF: Boolean): Double = math.sqrt(normSq(a, aF))

  /** Elementwise a−b (double-widened, index order) over min length. */
  def sub(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = get(a, i, aF) - get(b, i, bF); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** dot/(‖a‖·‖b‖) in one pass — three independent accumulators, each
    * summed in index order, so the result is bitwise what the composed
    * vdot/vnorm columns produced.
    */
  def cos(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, aF); val y = get(b, i, bF)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }
}

private[functions] trait VecTypes extends Expression {
  protected def vecInputs: Seq[Expression]
  protected def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes(): TypeCheckResult =
    vecInputs.collectFirst {
      case e if !e.dataType.isInstanceOf[ArrayType] ||
        (e.dataType.asInstanceOf[ArrayType].elementType != FloatType &&
         e.dataType.asInstanceOf[ArrayType].elementType != DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${e.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
}

/** `vec_dot(a, b)` — Σ aᵢ·bᵢ with float→double widening per element. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecTypes {
  override protected def vecInputs: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private lazy val aF = isFloatArr(left); private lazy val bF = isFloatArr(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecUtil.dot($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(l, r)
}

/** `vec_sub(a, b)` — elementwise a−b widened to double (index order),
  * `array<double>` out: the residual step of residual-quantized
  * indexes (x − centroid). Native because a `zip_with` lambda
  * evaluates interpreted per ELEMENT.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression with VecTypes {
  override protected def vecInputs: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private lazy val aF = isFloatArr(left); private lazy val bF = isFloatArr(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.sub(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecUtil.sub($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecSub =
    copy(l, r)
}

/** `vec_norm(a)` — ‖a‖₂. */
case class VecNorm(child: Expression) extends UnaryExpression with VecTypes {
  override protected def vecInputs: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private lazy val aF = isFloatArr(child)
  override def nullSafeEval(a: Any): Any =
    VecUtil.norm(a.asInstanceOf[ArrayData], aF)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VecUtil.norm($a, $aF)")
  override protected def withNewChildInternal(c: Expression): VecNorm = copy(c)
}

/** `vec_cos(a, b)` — cosine similarity, single pass over both arrays. */
case class VecCos(left: Expression, right: Expression)
    extends BinaryExpression with VecTypes {
  override protected def vecInputs: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  private lazy val aF = isFloatArr(left); private lazy val bF = isFloatArr(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VecUtil.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecUtil.cos($a, $b, $aF, $bF)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCos =
    copy(l, r)
}

/** Vector math over `array<float>` / `array<double>` embedding columns
  * (SURVEY §2 D5–D7, D13) as native codegen'd Catalyst expressions —
  * Spark's higher-order functions evaluate their lambdas interpreted
  * (~50× slower measured on exactly this shape), so the kernels live in
  * [[VecUtil]] and are called from generated code.
  */
object VecFuncs {
  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  /** Σ aᵢ·bᵢ with float→double widening per element. */
  def vdot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(expr(a), expr(b)))

  /** ‖a‖₂ */
  def vnorm(a: Column): Column = ExpressionUtils.column(VecNorm(expr(a)))

  /** Elementwise a−b as array<double> (the residual step). */
  def vsub(a: Column, b: Column): Column =
    ExpressionUtils.column(VecSub(expr(a), expr(b)))

  /** cosine(a, b) = dot / (‖a‖·‖b‖), one fused pass. */
  def vcos(a: Column, b: Column): Column =
    ExpressionUtils.column(VecCos(expr(a), expr(b)))
}
