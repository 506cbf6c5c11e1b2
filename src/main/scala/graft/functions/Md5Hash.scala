package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * CodegenFallback: the per-row work IS the digest; the surrounding
  * stage stays inside whole-stage codegen.
  */
object Md5Hash {
  /** MessageDigest is stateful and not thread-safe; getInstance per row
    * would dominate the loop. One instance per executor thread. */
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `OracleHash.low64` as one compiled kernel: the last 8 bytes of
  * md5(utf8(s)) read big-endian as a signed long. Null-intolerant like
  * the Column form (md5/conv propagate null). */
case class Md5Low64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_low64 expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val md = Md5Hash.digest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var h = 0L
    var k = 8
    while (k < 16) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    h
  }

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
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md5_words32 expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val md = Md5Hash.digest.get()
    md.reset()
    md.update(Md5Words32.Prefix)
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
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

  override protected def withNewChildInternal(newChild: Expression): Md5Words32 =
    copy(child = newChild)
}

object Md5Words32 {
  /** The MinHash-family domain separator ("m|"), as bytes. */
  private val Prefix: Array[Byte] = "m|".getBytes("UTF-8")
}
