package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature of an `array<string>` shingle column:
  * `numHashes` minima of the seed-indexed hash family
  * `xxhash64(k, shingle)` — BIT-IDENTICAL to the composed
  * aggregate/zip_with form (Spark's xxhash64 chains
  * `XXH64.hashInt(k, 42)` into `XXH64.hashUnsafeBytes(shingle)`; this
  * expression calls the same public XXH64 primitives in the same order,
  * pinned by DedupSpec), so banding parameters, measured recall, and every
  * q14 result carry over unchanged.
  *
  * Why native (SURVEY §7.3 preference (b)): signature hashing is THE
  * compute-dense stage of corpus-scale text dedup — numHashes string
  * hashes per shingle. The composed form additionally pays Catalyst's
  * interpreted lambda machinery per (shingle × hash): a fresh numHashes
  * array allocation per shingle plus boxed folds. Here the per-k seeds
  * `hashInt(k, seed)` are precomputed once per task and the inner loop is
  * primitive Java. NULL shingle elements hash as the bare seed (exactly
  * what xxhash64's null-skipping does in the composed form). */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** hashInt(k, seed) per hash index — the chained-seed prefix of
    * xxhash64(k, shingle), constant across rows. */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, seed))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    val n = arr.numElements()
    while (s < n) {
      if (arr.isNullAt(s)) {
        var k = 0
        while (k < numHashes) {
          if (seeds(k) < sig(k)) sig(k) = seeds(k)
          k += 1
        }
      } else {
        val u = arr.getUTF8String(s)
        val base = u.getBaseObject
        val off = u.getBaseOffset
        val len = u.numBytes()
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashUnsafeBytes(base, off, len, seeds(k))
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val sig = ctx.freshName("sig")
    val s = ctx.freshName("s")
    val k = ctx.freshName("k")
    val h = ctx.freshName("h")
    val u = ctx.freshName("u")
    val nElems = ctx.freshName("n")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $nElems = $arr.numElements();
         |for (int $s = 0; $s < $nElems; $s++) {
         |  if ($arr.isNullAt($s)) {
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      if ($seedsRef[$k] < $sig[$k]) $sig[$k] = $seedsRef[$k];
         |    }
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $u = $arr.getUTF8String($s);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      long $h = $xxh.hashUnsafeBytes($u.getBaseObject(),
         |        $u.getBaseOffset(), $u.numBytes(), $seedsRef[$k]);
         |      if ($h < $sig[$k]) $sig[$k] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}
