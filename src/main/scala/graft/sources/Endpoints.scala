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

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
