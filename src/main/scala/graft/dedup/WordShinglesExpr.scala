package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling of an `array<string>` token column —
  * behavior-identical to the composed form (pinned by DedupSpec):
  * fewer than `n` tokens yield ONE shingle joining all tokens (empty
  * string for an empty array), otherwise `size - n + 1` space-joined
  * n-grams; NULL tokens are skipped by the join exactly like `concat_ws`.
  *
  * Why native: the composed form builds each shingle through
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))` —
  * per shingle that is an interpreted lambda, a slice allocation, and a
  * varargs concat. Here it is one pass with UTF8String.concatWs. The
  * shingle column feeds [[MinHashSignature]] and the exact-Jaccard verify —
  * together the compute-dense inner loop of corpus-scale dedup. Codegen
  * emits a single virtual call on this expression (no per-element lambda
  * machinery; the heavy lifting is inside [[compute]]). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got $other")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  /** Join tokens [from, until) with single spaces, skipping NULLs
    * (concat_ws semantics). */
  private def joinRange(toks: ArrayData, from: Int, until: Int): UTF8String = {
    val parts = new Array[UTF8String](until - from)
    var i = from
    var k = 0
    while (i < until) {
      if (!toks.isNullAt(i)) { parts(k) = toks.getUTF8String(i); k += 1 }
      i += 1
    }
    UTF8String.concatWs(space, java.util.Arrays.copyOf(parts, k): _*)
  }

  def compute(input: ArrayData): ArrayData = {
    val m = input.numElements()
    if (m < n) {
      new GenericArrayData(Array[Any](joinRange(input, 0, m)))
    } else {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) {
        out(i) = joinRange(input, i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}
