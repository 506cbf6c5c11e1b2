package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints: polynomial rolling hash
  * `(acc*31 + char) % 2^30` over every k-char window, minimum of each
  * w-window of those, first-occurrence-distinct — bit-identical to the
  * higher-order-function formulation
  *   array_distinct(transform(seq, i -> array_min(slice(rolling, i, w))))
  * and to the DuckDB list_reduce oracle, but a compiled loop instead of
  * ~n·k interpreted lambda invocations per document (measured ~50× on
  * the sf0.1 corpus).
  *
  * Round-16 (advisory): real `doGenCode` (typed static call into
  * [[WinnowKernel]]) so the containing stage stays in whole-stage
  * codegen — the old CodegenFallback excluded the whole operator from
  * WSCG, not just this expression.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowKernel.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Positional winnowing: like [[WinnowFingerprints]] but each selected
  * minimum is returned WITH the 0-based rolling-hash index it was
  * taken from — `array<struct<pos:int, fp:bigint>>`, distinct by
  * (pos, fp). The positions are what turn fingerprint matching into
  * exact-substring SPAN detection: two documents sharing a run of
  * fingerprints at a constant position offset share a contiguous
  * substring (the winnowing guarantee, plus offset consistency), which
  * is the scalable form of suffix-array substring dedup. Tie-break:
  * the LEFTMOST minimum of each window (mirrored by the oracle's
  * list_position, which returns the first occurrence). */
case class WinnowSpans(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WinnowKernel.spans(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowKernel.spans($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowSpans =
    copy(child = newChild)
}

/** The JVM kernels behind [[WinnowFingerprints]] / [[WinnowSpans]] — a
  * companion-class-free object so the methods exist as true Java
  * statics for generated code. */
object WinnowKernel {

  /** Rolling hashes of every k-char window of `s` (at least one window;
    * short strings zero-pad, matching the oracle). */
  private def rollingHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    val M = 1073741824L // 2^30
    val nh = math.max(n - k + 1, 1)
    val rh = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var acc = 0L
      var j = 0
      while (j < k) {
        val c = if (i + j < n) s.charAt(i + j).toLong else 0L
        acc = (acc * 31 + c) % M
        j += 1
      }
      rh(i) = acc
      i += 1
    }
    rh
  }

  def fingerprints(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val rh = rollingHashes(input.toString, k)
    val nh = rh.length
    // winnow: min of each w-window, keep first occurrence
    val nw = math.max(nh - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var j = 0
      while (j < w) {
        val idx = i + j
        if (idx < nh && rh(idx) < m) m = rh(idx)
        j += 1
      }
      seen.add(m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }

  def spans(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val rh = rollingHashes(input.toString, k)
    val nh = rh.length
    val nw = math.max(nh - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var mp = i
      var j = 0
      while (j < w) {
        val idx = i + j
        if (idx < nh && rh(idx) < m) { m = rh(idx); mp = idx }
        j += 1
      }
      // (pos, fp) packed: fp < 2^30, pos < 2^31 — collision-free key
      seen.add((mp.toLong << 31) | m)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) {
      val key = it.next().longValue()
      out(p) = InternalRow((key >>> 31).toInt, key & ((1L << 31) - 1))
      p += 1
    }
    new GenericArrayData(out)
  }
}
