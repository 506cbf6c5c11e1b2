package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array: xxhash64 each token
  * (Spark's hash, seed 42 — reusing catalyst's XXH64 so values are
  * bit-identical to the `xxhash64` built-in), ±1 vote per bit lane,
  * sign of the vote becomes the output bit.
  *
  * Replaces the interpreted formulation
  *   aggregate(transform(tokens, t -> xxhash64(t)), array_repeat(0L,64),
  *     (acc,h) -> zip_with(acc, transform(sequence(0,63), ...), (x,y) -> x+y), ...)
  * which pays 64 interpreted lambda invocations per token per row —
  * the same HOF penalty measured at 40× on WinnowFingerprints. Here the
  * whole vote matrix is one compiled loop per row. Null tokens vote
  * like the built-in chain: xxhash64(NULL) yields the seed unchanged in
  * Spark's HOF form, but tokens from split() are never null, so the
  * expression rejects them loudly instead of guessing.
  *
  * CodegenFallback: the per-row work IS the loop; the surrounding
  * stage stays inside whole-stage codegen.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException("simhash64: null token at index " + i)
      val t = arr.getUTF8String(i)
      val h = XXH64.hashUTF8String(t, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
