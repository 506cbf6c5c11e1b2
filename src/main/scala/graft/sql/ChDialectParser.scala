package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** ClickHouse-dialect front door for `spark.sql(...)`: a delegating
  * parser (injected via GraftExtensions / spark.sql.extensions) that
  * detects the reference's CH constructs and routes the statement
  * through [[ChSqlTranslator]] before the standard Spark parser — so
  * `spark.sql("SELECT * FROM users_latest FINAL ORDER BY id")` or
  * `... ORDER BY id, __timestamp desc LIMIT 1 BY id` run verbatim,
  * no pre-translation call needed.
  *
  * Detection is marker-based, not try-parse-based, because the two
  * load-bearing constructs are NOT Spark syntax errors: `FROM t FINAL`
  * parses as a table alias and silently changes meaning, and a CH
  * function like argMax would fail at ANALYSIS, not parse. Statements
  * without CH markers go to the delegate untouched — Spark SQL
  * semantics (including Spark's own `round`) are not altered for
  * non-dialect users. As a safety net, a statement that fails the
  * standard parse is retried through the translator (covers
  * `LIMIT n BY`, template blocks, etc. when no other marker fired).
  *
  * Expressions/identifiers/schemas always delegate: the dialect exists
  * at statement level only.
  */
class ChDialectParser(delegate: ParserInterface) extends ParserInterface {

  /** now()/now64() get Spark's wall clock (ClickHouse-faithful) in this
    * ad-hoc path; deterministic pipelines inject an asOf via PipeRunner
    * instead and never reach this default. */
  private def translate(sqlText: String): String =
    ChSqlTranslator.translate(sqlText,
      asOf = None, nowFallbackToWallClock = true)

  /** Marker hit → translate (a translator error is then a genuine
    * dialect error and propagates). No marker → delegate; if the
    * delegate rejects, retry once through the translator, but NEVER let
    * a translator failure mask the original ParseException. */
  private def viaDialect(sqlText: String, parse: String => LogicalPlan): LogicalPlan =
    if (ChDialectParser.looksChDialect(sqlText)) parse(translate(sqlText))
    else try parse(sqlText) catch {
      case e: ParseException =>
        val t = try translate(sqlText) catch { case _: Throwable => throw e }
        if (t == sqlText.trim) throw e
        else try parse(t) catch { case _: Throwable => throw e }
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    viaDialect(sqlText, delegate.parsePlan)

  override def parseQuery(sqlText: String): LogicalPlan =
    viaDialect(sqlText, delegate.parseQuery)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object ChDialectParser {

  /** CH-only constructs the reference pipes use. `\b…\b` word
    * boundaries keep identifiers like `users_latest__final` (already-
    * translated SQL) from matching. Function markers are CASE-SENSITIVE
    * — ClickHouse function names themselves are case-sensitive, and a
    * user function named `argmax` must NOT reroute a plain statement.
    * Keywords (`LIMIT n BY`, `FINAL`) are case-insensitive like every
    * CH keyword; for FINAL the alias collision is resolved by usage: a
    * qualifier reference `final.col` anywhere in the statement proves
    * `final` is a real alias, so the marker stands down. A bare
    * unreferenced alias literally named `final` is indistinguishable
    * from the CH modifier and reads as CH dialect here — documented
    * boundary of sharing one front door. The stand-down is
    * statement-global: a statement that BOTH uses a real `final` alias
    * qualifier AND means CH FINAL elsewhere is not translated — also a
    * documented boundary (split the statement). */
  private val markers = Seq(
    """(?is)\bLIMIT\s+\d+\s+BY\b""",
    """(?s)\{%""", // Tinybird template block
    """(?s)\bnumbers\s*\(""",
    """(?s)\b(toStartOfMinute|toStartOfHour|toStartOfDay|subtractHours|
      |addMinutes|fromUnixTimestamp64Micro|toFixedString|toDateTime|toYYYYMM|
      |argMax|argMin|now64|countIf|sumIf|avgIf|uniqExact|toDate|toYYYYMMDD|
      |quantileExact|quantile|uniq|multiIf|arrayJoin)\s*\(""".stripMargin.replace("\n", "")
  ).map(_.r)

  private val finalMarker = """(?is)\bFROM\s+\w+\s+FINAL\b""".r
  private val finalQualifier = """(?is)\bFINAL\s*\.\s*[\w`]""".r

  /** Markers match against a copy with line comments stripped and then
    * string-literal CONTENTS blanked: `WHERE note = 'use argMax(a,b)'`
    * is a plain Spark statement, and a phantom marker hit would route
    * it through the translator (whose round() rewrite is a real
    * semantic change). Comments strip FIRST — an apostrophe inside
    * `-- user's note` would otherwise open a phantom literal and blank
    * genuine markers after it (translate() applies the same order). */
  private def maskLiterals(raw: String): String = {
    val s = ChSqlTranslator.stripLineComments(raw)
    val mask = ChSqlTranslator.inStringMask(s)
    val out = s.toCharArray
    var i = 0
    while (i < out.length) {
      if (mask(i)) out(i) = ' '
      i += 1
    }
    new String(out)
  }

  def looksChDialect(sqlText: String): Boolean = {
    val t = maskLiterals(sqlText)
    markers.exists(_.findFirstIn(t).isDefined) ||
      (finalMarker.findFirstIn(t).isDefined &&
        finalQualifier.findFirstIn(t).isEmpty)
  }
}
