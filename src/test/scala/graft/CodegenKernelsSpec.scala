package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._

/** Round-16: the native kernels (Md5Low64, Md5Words32, SimHash64,
  * WinnowFingerprints, WinnowSpans) moved from CodegenFallback to real
  * `doGenCode` — `CollapseCodegenStages` rejects any operator whose
  * expressions contain a CodegenFallback, so the fallback forms were
  * silently dropping every containing projection out of whole-stage
  * codegen. This spec pins BOTH halves of that change:
  *
  *  1. value identity on NON-FOLDABLE inputs (literal-based pins are
  *     constant-folded at optimization time and never reach doGenCode;
  *     these inputs are derived from range(id), so the generated code
  *     path is the one executing);
  *  2. the containing stage IS whole-stage-codegen'd (the point of the
  *     change — a regression back to fallback keeps values green but
  *     kills the fusion).
  */
class CodegenKernelsSpec extends SparkSpec {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  import graft.functions._

  // non-foldable strings with unicode, empties and repetition
  private def corpus = spark.range(64).selectExpr(
    """concat(
       cast(id as string), ' café 日本語 ',
       repeat(concat('w', cast(id % 7 as string), ' '), cast(id % 9 as int)),
       case when id % 5 = 0 then '' else 'tail' end) as s""")

  private def wsCodegen(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec
          if w.child.toString.contains("Project") => w
    }.nonEmpty

  test("Md5Low64 == conv/substring/md5 Column form, inside WSCG") {
    val df = corpus.select(
      column(Md5Low64(expression(col("s")))).as("native"),
      // the original Column formulation the kernel replaced: the last
      // 8 md5 bytes via hex substring + base-16 parse, recentred to
      // signed. conv returns the unsigned decimal rendering as string;
      // cast to decimal then subtract 2^64 when >= 2^63.
      (conv(substring(md5(col("s")), 17, 16), 16, 10).cast("decimal(22,0)")
        - when(conv(substring(md5(col("s")), 17, 16), 16, 10)
            .cast("decimal(22,0)") >= lit(BigDecimal("9223372036854775808")),
            lit(BigDecimal("18446744073709551616"))).otherwise(lit(0)))
        .cast("long").as("ref"))
    assert(df.filter(col("native") =!= col("ref")).count() == 0)
    assert(wsCodegen(df.select(col("native"))),
      "Md5Low64 projection fell out of whole-stage codegen")
  }

  test("Md5Words32 == conv/substring words, inside WSCG") {
    val words = (0 until 4).map(g =>
      conv(substring(md5(concat(lit("m|"), col("s"))), g * 8 + 1, 8), 16, 10)
        .cast("long"))
    val df = corpus.select(
      column(Md5Words32(expression(col("s")))).as("native"),
      array(words: _*).as("ref"))
    assert(df.filter(not(col("native") <=> col("ref"))).count() == 0)
    assert(wsCodegen(df.select(col("native"))),
      "Md5Words32 projection fell out of whole-stage codegen")
  }

  test("SimHash64 == vote-matrix recompute, inside WSCG") {
    val toks = corpus.select(split(col("s"), " ").as("t"))
    val df = toks.select(col("t"),
      column(SimHash64(expression(col("t")))).as("native"))
    val rows = df.collect()
    def jvmLow64(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(
        x.getBytes("UTF-8"))
      (8 until 16).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
    }
    rows.foreach { r =>
      val ts = r.getSeq[String](0)
      val votes = new Array[Int](64)
      ts.foreach { t =>
        val h = jvmLow64(t)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        }
      }
      val want = (0 until 64).foldLeft(0L)((a, b) =>
        if (votes(b) > 0) a | (1L << b) else a)
      assert(r.getLong(1) == want)
    }
    assert(wsCodegen(df.select(col("native"))),
      "SimHash64 projection fell out of whole-stage codegen")
  }

  test("WinnowFingerprints/WinnowSpans == HOF formulation, inside WSCG") {
    val k = 5; val w = 4
    val df = corpus.select(col("s"),
      column(WinnowFingerprints(expression(col("s")), k, w)).as("fp"),
      column(WinnowSpans(expression(col("s")), k, w)).as("sp"))
    // HOF reference for fingerprints (the formulation the kernel
    // replaced, same zero-padding and first-occurrence distinct)
    val ref = corpus.selectExpr("s", s"""
      array_distinct(transform(
        sequence(1, greatest(greatest(length(s) - $k + 1, 1) - $w + 1, 1)),
        i -> array_min(slice(
          transform(sequence(0, greatest(length(s) - $k, 0)),
            p -> aggregate(sequence(1, $k), 0L,
              (acc, j) -> (acc * 31 + coalesce(ascii(substring(s, p + j, 1)), 0))
                % 1073741824)),
          i, $w)))) as ref_fp""")
    val joined = df.join(ref, "s")
    assert(joined.filter(not(col("fp") <=> col("ref_fp"))).count() == 0,
      "WinnowFingerprints diverged from the HOF reference")
    // spans: positions must reproduce fingerprints (fp stream equal to
    // the distinct of span fps in first-occurrence order)
    val spanChk = df.selectExpr("fp",
      "array_distinct(transform(sp, x -> x.fp)) as sp_fp")
    assert(spanChk.filter(not(col("fp") <=> col("sp_fp"))).count() == 0)
    assert(wsCodegen(df.select(col("fp"))),
      "WinnowFingerprints projection fell out of whole-stage codegen")
    assert(wsCodegen(df.select(col("sp"))),
      "WinnowSpans projection fell out of whole-stage codegen")
  }
}
