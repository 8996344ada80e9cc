package graft.vector

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity of two `array<float|double>` vectors — the
  * codegen'd form of `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with
  * the zero-denominator → 0.0 guard, arithmetic-identical to the composed
  * column form (each of the three sums accumulates in ascending element
  * order as doubles, so results are bit-identical — pinned by
  * SimilaritySpec). One pass computes all three sums.
  *
  * This sits on every ANN scoring path (brute-force baseline, LSH/IVF
  * verify joins, embedding near-dup verify): the composed
  * higher-order-function form runs through Catalyst's interpreted lambda
  * machinery per element. Length mismatch and NULL array elements both
  * return NULL (exactly what the composed form's zip_with-padding and
  * null-propagating fold produce), never a truncated or zero-filled
  * score. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val xf = isFloat(left); val yf = isFloat(right)
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      // a NULL element nulls the whole score in the composed form (the
      // null propagates through the dot fold) — match it, never read a
      // null slot as 0.0
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) 0.0 else ab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val ab = ctx.freshName("ab")
    val aa = ctx.freshName("aa")
    val bb = ctx.freshName("bb")
    val xi = ctx.freshName("xi")
    val yi = ctx.freshName("yi")
    val denom = ctx.freshName("denom")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $getX;
         |    double $yi = $getY;
         |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |    ${ev.value} = ($denom == 0.0) ? 0.0 : $ab / $denom;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}
