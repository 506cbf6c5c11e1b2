package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native Catalyst expression: dot product of two float-array columns
  * with double accumulation, left-to-right — bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * but emitted as a tight fused loop inside whole-stage codegen instead
  * of an interpreted higher-order-function chain (one virtual call per
  * element). On brute-force KNN this is the hot inner loop: |Q|·|N|·dim
  * multiply-adds.
  *
  * Preference order per the build rules: built-ins couldn't express this
  * without leaving codegen, so a scalar Expression with doGenCode is the
  * next step down — no UDF, no plan-level surgery needed.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"vector_dot: dimension mismatch ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // fresh names per call site: several dots can land in ONE
      // codegen stage (e.g. scoring a row against every anchor), and
      // fixed names would collide — janino rejects the stage and the
      // whole pipeline silently falls back to interpreted evaluation
      val n = ctx.freshName("graftN")
      val s = ctx.freshName("graftS")
      val i = ctx.freshName("graftI")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "vector_dot: dimension mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: squared euclidean distance between one
  * contiguous subspace of two float-array columns — the inner kernel of
  * product quantization (PQ code assignment and the per-query ADC
  * lookup table). `start`/`len` select the 0-based slice [start,
  * start+len); accumulation is double, left-to-right — bit-identical to
  * `aggregate(zip_with(slice(a,start+1,len), slice(b,start+1,len),
  * (x,y) -> (double(x)-double(y))^2), 0d, +)`.
  *
  * Why native: pqBest evaluates this m=8 times per (vector, codeword)
  * row — 128 subspace distances per corpus vector — and interpreted
  * HOF lambdas cost one virtual call per element with no codegen CSE
  * (the repo measured 3-40× on the same shape in WinnowFingerprints /
  * SimHash64 / VectorDot). One fused loop per call keeps the whole
  * scoring projection inside whole-stage codegen. */
case class SubspaceDist(left: Expression, right: Expression,
                        start: Int, len: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"subspace_dist expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // fail fast on a vector shorter than the subspace, like
    // VectorDot's dimension check: the interpreted zip_with form this
    // replaced surfaced such rows as NULL (null-padding poisons the
    // fold) — silently truncating would instead assign a PQ code to a
    // corrupt row
    if (x.numElements() < start + len || y.numElements() < start + len)
      throw new IllegalArgumentException(
        s"subspace_dist: vector shorter than subspace [$start, ${start + len}) " +
          s"(${x.numElements()} vs ${y.numElements()})")
    var s = 0.0
    var i = start
    val end = start + len
    while (i < end) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val s = ctx.freshName("graftS")
      val d = ctx.freshName("graftD")
      val i = ctx.freshName("graftI")
      s"""
         |if ($x.numElements() < ${start + len} || $y.numElements() < ${start + len}) {
         |  throw new IllegalArgumentException(
         |    "subspace_dist: vector shorter than subspace [$start, ${start + len}) (" +
         |      $x.numElements() + " vs " + $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = $start; $i < ${start + len}; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubspaceDist =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native functions, so they are
  * usable from SQL text as well as the Column API. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fingerprints", exprs => WinnowFingerprints(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "subspace_dist", exprs => SubspaceDist(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_spans", exprs => WinnowSpans(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
  }
}

/** Library packaging: register the engine's functions AND the
  * ClickHouse-dialect parser front door through the
  * SparkSessionExtensions mechanism, so a deployment enables the whole
  * surface with
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * instead of per-session calls. With the extension active,
  * `spark.sql` accepts the reference's pipe SQL verbatim
  * (`FROM t FINAL`, `LIMIT 1 BY k`, toStartOfMinute, argMax, …) —
  * see [[graft.sql.ChDialectParser]]. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new graft.sql.ChDialectParser(delegate))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_fingerprints"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFingerprints(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("subspace_dist"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SubspaceDist].getName, "subspace_dist"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SubspaceDist(exprs(0), exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue(),
          exprs(3).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(exprs(0))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_spans"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[WinnowSpans].getName, "winnow_spans"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowSpans(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())))
  }
}
