package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a token array: hash each token with the
  * engine's [[OracleHash]] family (md5-low64 — the last 8 digest bytes
  * big-endian as a signed long, bit-identical to `OracleHash.low64` and
  * reproducible in the DuckDB oracle), ±1 vote per bit lane, sign of
  * the vote becomes the output bit.
  *
  * Replaces the interpreted formulation
  *   aggregate(transform(tokens, t -> low64(t)), array_repeat(0L,64),
  *     (acc,h) -> zip_with(acc, transform(sequence(0,63), ...), (x,y) -> x+y), ...)
  * which pays 64 interpreted lambda invocations per token per row —
  * the same HOF penalty measured at 40× on WinnowFingerprints. Here the
  * whole vote matrix is one compiled loop per row, and the md5 runs on
  * the token's raw UTF-8 bytes with a reused per-thread digest (no hex
  * string round-trip like the Column form). Tokens from split() are
  * never null; the expression rejects nulls loudly instead of guessing.
  *
  * Round-16 (advisory): real `doGenCode` (typed static call) so the
  * containing stage stays in whole-stage codegen — CodegenFallback
  * excluded the whole operator from WSCG, not just this expression.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashKernel.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** The JVM kernel behind [[SimHash64]] — a companion-class-free object
  * so the method exists as a true Java static for generated code. */
object SimHashKernel {
  def simhash64(arr: ArrayData): Long = {
    val md = Md5Hash.digest.get()
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException("simhash64: null token at index " + i)
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // OracleHash.low64: digest bytes 8..15 big-endian as signed long
      var h = 0L
      var k = 8
      while (k < 16) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
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
}
