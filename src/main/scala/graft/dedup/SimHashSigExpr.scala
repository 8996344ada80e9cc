package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native SimHash over an `array<string>` token column with the xxhash64
  * token-hash family — BIT-IDENTICAL to the composed
  * [[Dedup.simhashSig]] form with the default hash (Spark's `xxhash64(t)`
  * is `XXH64.hashUnsafeBytes(bytes, seed=42)`; a NULL token leaves the
  * hash at the bare seed, exactly like xxhash64's null-skipping — both
  * pinned by DedupSpec). Per-bit ±1 majority votes accumulate in one
  * primitive loop instead of a per-token interpreted zip_with over the
  * vote vector.
  *
  * The 60-bit md5 family used by the q15 oracle stays on the composed
  * [[Dedup.simhashSig]] path (md5 is there precisely because an external
  * SQL engine must recompute it). */
case class SimHashSig(child: Expression, bits: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string>, got $other")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (toks.isNullAt(i)) seed
        else {
          val u = toks.getUTF8String(i)
          XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), seed)
        }
      var k = 0
      while (k < bits) {
        votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
      i += 1
    }
    var sig = 0L
    var k = 0
    while (k < bits) {
      if (votes(k) > 0) sig |= (1L << k)
      k += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val votes = ctx.freshName("votes")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val h = ctx.freshName("h")
    val u = ctx.freshName("u")
    val n = ctx.freshName("n")
    val sig = ctx.freshName("sig")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |int[] $votes = new int[$bits];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h;
         |  if ($arr.isNullAt($i)) {
         |    $h = ${seed}L;
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $u = $arr.getUTF8String($i);
         |    $h = $xxh.hashUnsafeBytes($u.getBaseObject(), $u.getBaseOffset(),
         |      $u.numBytes(), ${seed}L);
         |  }
         |  for (int $k = 0; $k < $bits; $k++) {
         |    $votes[$k] += ((($h >>> $k) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $k = 0; $k < $bits; $k++) {
         |  if ($votes[$k] > 0) $sig |= (1L << $k);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}
