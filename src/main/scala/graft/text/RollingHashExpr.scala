package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native order-sensitive rolling hash over an `array<string>` token
  * column — BIT-IDENTICAL to the composed
  * `aggregate(tokens, seed, (acc, t) => xxhash64(acc, t))` form (Spark's
  * two-child xxhash64 chains `XXH64.hashLong(acc, 42)` into the token's
  * byte hash; a NULL token contributes only the long-hash step, matching
  * xxhash64's null-skipping — both pinned by TextAnalysisSpec). One
  * primitive loop instead of a per-token interpreted fold. */
case class RollingHash(child: Expression, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires array<string>, got $other")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    var acc = seed
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      var h = XXH64.hashLong(acc, 42L)
      if (!toks.isNullAt(i)) {
        val u = toks.getUTF8String(i)
        h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), h)
      }
      acc = h
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = ctx.freshName("acc")
    val h = ctx.freshName("h")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val u = ctx.freshName("u")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long $acc = ${seed}L;
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $xxh.hashLong($acc, 42L);
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $u = $arr.getUTF8String($i);
         |    $h = $xxh.hashUnsafeBytes($u.getBaseObject(), $u.getBaseOffset(),
         |      $u.numBytes(), $h);
         |  }
         |  $acc = $h;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}
