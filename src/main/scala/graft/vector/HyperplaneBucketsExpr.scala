package graft.vector

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression computing ALL `tables` hyperplane-LSH bucket
  * ids of an embedding in one pass: input `array<float|double>` of length
  * `dim`, output `array<long>` of length `tables` (element t = the
  * `planes`-bit sign pattern of v·h under table t's hyperplane set, seeded
  * `seed + t * 7919L` — the same deterministic family as
  * [[Similarity.hyperplanes]]).
  *
  * Why a custom expression (SURVEY §7.3 preference (b)): the composed
  * higher-order-function form evaluates through Catalyst's interpreted
  * lambda machinery — measured ~20 s for 200k rows × 16 tables × 8 planes
  * on 8 threads — while this codegen'd triple loop is plain primitive Java
  * arithmetic inside whole-stage codegen. Arithmetic parity: projections
  * accumulate in ascending element order as doubles, exactly like the
  * column form, so every bucket id is bit-identical (pinned by
  * SimilaritySpec) and the LSH capture analysis carries over unchanged.
  *
  * Vectors whose length differs from `dim` are rejected (raise) — in
  * EITHER direction: a shorter vector would read out of bounds, and a
  * longer one silently truncated to its first `dim` elements would land in
  * a wrong-but-plausible bucket (the length check is `!=`, not `<`). A
  * vector containing a NULL element yields bucket 0 in every table,
  * exactly what the composed form's null-propagating projections
  * produce. */
case class HyperplaneBuckets(child: Expression, dim: Int, planes: Int,
    tables: Int, seed: Long) extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in [1,63], got $planes")
  require(tables >= 1, s"tables must be >= 1, got $tables")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets requires array<float> or array<double>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (tables × planes × dim) sign matrix, flattened row-major for cache
    * locality; a few KB, shipped once per task as a reference object. */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](tables * planes * dim)
    var t = 0
    while (t < tables) {
      val hs = Similarity.hyperplanes(dim, planes, seed + t * 7919L)
      var p = 0
      while (p < planes) {
        System.arraycopy(hs(p), 0, out, (t * planes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: vector has ${arr.numElements()} elements, expected $dim")
    // a NULL element nulls every projection in the composed form, whose
    // `when(proj >= 0, bit)` then contributes 0 for EVERY plane — i.e.
    // bucket 0 in every table. Match that, never read a null slot as 0.0.
    var z = 0
    while (z < dim) {
      if (arr.isNullAt(z)) return new GenericArrayData(new Array[Long](tables))
      z += 1
    }
    val isFloat = elementIsFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var acc = 0.0
        val base = (t * planes + p) * dim
        var i = 0
        while (i < dim) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          acc += x * flat(base + i)
          i += 1
        }
        if (acc >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("graftHyperplanes", flat, "double[]")
    // fresh names: codegen fragments share one Java method scope, so plain
    // `i`/`acc` locals would collide with neighboring expressions
    val out = ctx.freshName("buckets")
    val t = ctx.freshName("t")
    val p = ctx.freshName("p")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val base = ctx.freshName("base")
    val bucket = ctx.freshName("bucket")
    val hasNull = ctx.freshName("hasNull")
    nullSafeCodeGen(ctx, ev, arr => {
      val get =
        if (elementIsFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($arr.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_buckets: vector has " + $arr.numElements() +
         |    " elements, expected $dim");
         |}
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($arr.isNullAt($i)) { $hasNull = true; break; }
         |}
         |long[] $out = new long[$tables];
         |for (int $t = 0; !$hasNull && $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $acc = 0.0;
         |    int $base = ($t * $planes + $p) * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $acc += $get * $mat[$base + $i];
         |    }
         |    if ($acc >= 0.0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_buckets"
}
