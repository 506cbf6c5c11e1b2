package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the [[OracleHash]] md5 family.
  *
  * The Column formulations (`conv(substring(md5(x), 17, 8), 16, 10)` …)
  * are bit-correct but pay, per hashed value, a 32-char hex-string
  * allocation plus 2-5 substring slices and base-16 string parses —
  * pure overhead around a 16-byte digest. These expressions compute the
  * SAME values (pinned against the Column forms in ChFunctionsSpec and
  * by every oracle-verified consumer) straight from the digest bytes
  * with a reused per-thread MessageDigest: no hex round-trip, no conv.
  * Same device as [[SimHash64]], which already embeds this exact
  * low64 byte read.
  *
  * Round-16 (advisory): the kernels now implement real `doGenCode` —
  * a typed call into the same per-thread-digest helpers — because
  * `CollapseCodegenStages` rejects any operator whose expressions
  * contain a `CodegenFallback`, so the old fallback forms silently
  * dropped every containing projection/aggregate out of whole-stage
  * codegen (the opposite of what the original comment claimed).
  */
object Md5Hash {
  /** MessageDigest is stateful and not thread-safe; getInstance per row
    * would dominate the loop. One instance per executor thread. */
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The MinHash-family domain separator ("m|"), as bytes. */
  private val Prefix: Array[Byte] = "m|".getBytes("UTF-8")

  /** md5(utf8)'s last 8 bytes big-endian as a signed long — the JVM
    * kernel behind [[Md5Low64]], called from both interpreted eval and
    * generated code. */
  def low64(input: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(input.getBytes)
    var h = 0L
    var k = 8
    while (k < 16) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h
  }

  /** The four 32-bit big-endian words of md5("m|" ++ utf8) as
    * ArrayData — the JVM kernel behind [[Md5Words32]]. */
  def words32(input: UTF8String): GenericArrayData = {
    val md = digest.get()
    md.reset()
    md.update(Prefix)
    val d = md.digest(input.getBytes)
    val words = new Array[Long](4)
    var g = 0
    while (g < 4) {
      var w = 0L
      var k = 4 * g
      while (k < 4 * g + 4) { w = (w << 8) | (d(k) & 0xffL); k += 1 }
      words(g) = w
      g += 1
    }
    new GenericArrayData(words)
  }
}

/** `OracleHash.low64` as one compiled kernel: the last 8 bytes of
  * md5(utf8(s)) read big-endian as a signed long. Null-intolerant like
  * the Column form (md5/conv propagate null). */
case class Md5Low64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_low64 expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.low64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static-forwarder call: Md5Hash is a companion-class-free object,
    // so `graft.functions.Md5Hash.low64` exists as a true Java static
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.low64($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Low64 =
    copy(child = newChild)
}

/** The four 32-bit big-endian words of md5("m|" ++ utf8(s)) as
  * array<long> — the shared digest behind `OracleHash.seeded32`'s
  * 16-lane family ([[OracleHash.digests32]]). The "m|" domain prefix
  * is applied to the DIGEST INPUT here (two update calls, no string
  * concat allocation); word g equals
  * `conv(substring(md5('m|' || s), g*8+1, 8), 16, 10)` exactly —
  * non-negative, < 2^32. */
case class Md5Words32(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_words32 expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash.words32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hash.words32($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Words32 =
    copy(child = newChild)
}
