package graft.sources

import org.apache.spark.sql.DataFrame

/** S6 — the HTTP JSON endpoint payload shape
  * (`GET /v0/pipes/{name}.json` → `{"meta":[...],"data":[...],"rows":N}`,
  * consumed at modules/tb_functions.py:264-273 / dash_airport.py:29-32).
  * The engine side of the contract: schema-derived meta + row objects.
  * Serving stays out of engine scope (SURVEY §1.1); any HTTP layer can
  * return this string verbatim.
  *
  * `limit` bounds the driver-side collect — endpoints are dashboard
  * payloads (the reference's clients truncate client-side,
  * dash_airport.py:174); bulk egress should write parquet instead.
  */
object Endpoints {
  def toJsonPayload(df: DataFrame, limit: Int = 10000): String = {
    val meta = df.schema.fields.map(f =>
      s"""{"name":${q(f.name)},"type":${q(f.dataType.simpleString)}}""")
      .mkString("[", ",", "]")
    val rows = df.limit(limit).toJSON.collect()
    s"""{"meta":$meta,"data":${rows.mkString("[", ",", "]")},"rows":${rows.length}}"""
  }

  /** NDJSON rendering (`GET /v0/pipes/{name}.ndjson`): one JSON object
    * per line, no envelope — the streaming-consumer format. Zero rows
    * render as an EMPTY body, not a blank line (strict line-per-object
    * consumers error on an empty line). */
  def toNdjson(df: DataFrame, limit: Int = 10000): String = {
    val rows = df.limit(limit).toJSON.collect()
    if (rows.isEmpty) "" else rows.mkString("", "\n", "\n")
  }

  /** CSV rendering (`GET /v0/pipes/{name}.csv`): header row + RFC-4180
    * quoting (quote when the value holds comma/quote/newline). */
  def toCsv(df: DataFrame, limit: Int = 10000): String = {
    def cell(v: Any): String = {
      val s = if (v == null) "" else v.toString
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val header = df.columns.map(cell).mkString(",")
    val rows = df.limit(limit).collect()
      .map(r => (0 until r.length).map(i => cell(r.get(i))).mkString(","))
    (header +: rows).mkString("", "\n", "\n")
  }

  private[sources] def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
