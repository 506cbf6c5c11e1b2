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

  private def translate(sqlText: String): String = ChSqlTranslator.translate(sqlText)

  override def parsePlan(sqlText: String): LogicalPlan =
    if (ChDialectParser.looksChDialect(sqlText)) delegate.parsePlan(translate(sqlText))
    else try delegate.parsePlan(sqlText) catch {
      case e: ParseException =>
        val t = translate(sqlText)
        if (t == sqlText.trim) throw e
        else try delegate.parsePlan(t) catch { case _: ParseException => throw e }
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    if (ChDialectParser.looksChDialect(sqlText)) delegate.parseQuery(translate(sqlText))
    else try delegate.parseQuery(sqlText) catch {
      case e: ParseException =>
        val t = translate(sqlText)
        if (t == sqlText.trim) throw e
        else try delegate.parseQuery(t) catch { case _: ParseException => throw e }
    }

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

  /** CH-only constructs the reference pipes use; `\b…\b` word
    * boundaries keep identifiers like `users_latest__final` (already-
    * translated SQL) from matching. */
  private val markers = Seq(
    """(?is)\bLIMIT\s+\d+\s+BY\b""",
    """(?is)\bFROM\s+\w+\s+FINAL\b""",
    """(?s)\{%""", // Tinybird template block
    """(?is)\bnumbers\s*\(""",
    """(?is)\b(toStartOfMinute|toStartOfHour|toStartOfDay|subtractHours|
      |addMinutes|fromUnixTimestamp64Micro|toFixedString|toDateTime|toYYYYMM|
      |argMax|argMin|now64)\s*\(""".stripMargin.replace("\n", "")
  ).map(_.r)

  def looksChDialect(sqlText: String): Boolean =
    markers.exists(_.findFirstIn(sqlText).isDefined)
}
