package graft.sources

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.InetSocketAddress

/** The reference's read-API surface (`GET /v0/pipes` list +
  * `GET /v0/pipes/{name}.json` with `Authorization: Bearer <token>`,
  * consumed at modules/tb_functions.py:255-273 and by every dashboard
  * call) as a thin serving adapter over the engine.
  *
  * Scope discipline: SURVEY §1.1 keeps serving OUT of the engine — the
  * engine's contract is [[Endpoints.toJsonPayload]] (the payload
  * document) and the query registry. This adapter adds ONLY transport
  * and auth on top of that contract, uses nothing beyond the JDK's
  * built-in HTTP server, and owns no query logic: any deployment that
  * prefers its own gateway serves the same payloads without it.
  *
  * Token model (TOKEN "name" READ — the first line of every reference
  * pipe): a bearer credential maps to the set of pipe names it may
  * read, `*` granting all (the reference's workspace admin token).
  * Like the reference, a token that exists but lacks the pipe is
  * forbidden (403), an unknown token is unauthorized (401), an
  * unknown pipe is 404, and a bad parameter is 400.
  *
  * Status semantics verified against tb_functions.py's strict mode
  * (raise_for_status on anything non-2xx). */
final class ApiServer(spark: SparkSession, sfDir: String,
                      tokens: Map[String, Set[String]],
                      rowLimit: Int = 10000) {

  /** Parameterized pipes route through [[ParamEndpoints]]; everything
    * registered routes through the plain query registry (rejecting
    * params — a typo'd threshold must not silently return defaults). */
  private val parameterized: Map[String, (SparkSession, String, Map[String, String]) => DataFrame] = Map(
    "docs_near_dup_pairs" -> (ParamEndpoints.docsNearDupPairs _),
    "docs_minhash_lsh_pairs" -> (ParamEndpoints.docsMinhashLshPairs _),
    "emb_near_dup_pairs" -> (ParamEndpoints.embNearDupPairs _),
    "emb_knn_ivf" -> (ParamEndpoints.embKnnIvf _),
    "events_in_window" -> (ParamEndpoints.eventsInWindow _),
    "ref_flights_missed_pct_minute" -> (ParamEndpoints.refFlightsMissedPctMinute _))

  private def pipeNames: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/v0/pipes", (ex: HttpExchange) => handle(ex))
    // without an executor the JDK server handles requests on its
    // dispatch thread — one slow query would serialize every client.
    // A small pool matches the dashboard concurrency the reference
    // serves; SparkSession is thread-safe for concurrent actions.
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    s
  }

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      if (ex.getRequestMethod != "GET") {
        // the read API is GET-only (tb_functions.py uses requests.get
        // for every pipe read; DELETE/POST address the control plane,
        // which is out of engine scope)
        respond(ex, 405, """{"error":"read API is GET-only"}""")
        return
      }
      val path = ex.getRequestURI.getPath
      authorized(ex) match {
        case None => respond(ex, 401, """{"error":"invalid or missing token"}""")
        case Some(grants) if path == "/v0/pipes" || path == "/v0/pipes/" =>
          val visible = pipeNames.filter(p => grants("*") || grants(p))
          val items = visible.map(n =>
            s"""{"name":"$n","type":"endpoint"}""").mkString("[", ",", "]")
          respond(ex, 200, s"""{"pipes":$items}""")
        case Some(grants) =>
          // format suffix selects the rendering, like the reference API
          // (.json envelope, .csv, .ndjson; bare name defaults to json)
          val tail = path.stripPrefix("/v0/pipes/")
          val (name, format) = tail.lastIndexOf('.') match {
            case i if i > 0 && Set("json", "csv", "ndjson")(tail.substring(i + 1)) =>
              (tail.take(i), tail.substring(i + 1))
            case _ => (tail, "json")
          }
          if (!graft.SparkEntry.queries.contains(name))
            respond(ex, 404, s"""{"error":"pipe not found: $name"}""")
          else if (!(grants("*") || grants(name)))
            respond(ex, 403, s"""{"error":"token lacks READ on $name"}""")
          else {
            val params = queryParams(ex)
            val df = parameterized.get(name) match {
              case Some(f) => f(spark, sfDir, params)
              case None =>
                require(params.isEmpty,
                  s"pipe $name takes no parameters: ${params.keys.mkString(", ")}")
                graft.SparkEntry.queries(name)(spark, sfDir)
            }
            val rendered = format match {
              case "csv" => (Endpoints.renderCsv(df, rowLimit), "text/csv")
              case "ndjson" =>
                (Endpoints.renderNdjson(df, rowLimit), "application/x-ndjson")
              case _ => (Endpoints.renderJson(df, rowLimit), "application/json")
            }
            // envelope-less formats signal a clipped result via header
            // (the .json envelope carries rows_before_limit_at_least)
            if (rendered._1.overflow)
              ex.getResponseHeaders.set("X-Rows-Before-Limit-At-Least",
                String.valueOf(rowLimit + 1))
            respond(ex, 200, rendered._1.body, rendered._2)
          }
      }
    } catch {
      // String.valueOf: an IAE raised inside Spark can carry a null
      // message, and an NPE inside this handler would abandon the
      // exchange with no response at all (client hangs to EOF)
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":${Endpoints.q(String.valueOf(e.getMessage))}}""")
      case e: Throwable =>
        // generic body: raw internal messages leak paths/plan fragments
        // to any authenticated client; the detail goes to the server log
        System.err.println(s"[api] 500 on ${ex.getRequestURI}: $e")
        respond(ex, 500, """{"error":"internal error"}""")
    }

  /** Bearer token → its pipe grants, None when missing/unknown. */
  private def authorized(ex: HttpExchange): Option[Set[String]] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer "))
      .map(_.stripPrefix("Bearer "))
      .flatMap(tokens.get)

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map {
      _.split("&").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"malformed query parameter: $kv")
        java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap
    }.getOrElse(Map.empty)

  private def respond(ex: HttpExchange, code: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

}

object ApiServer {
  /** TOKEN declarations from pipe-file text (`TOKEN "name" READ` —
    * e.g. latest_flight_info.pipe:1): (token name, granted pipe). The
    * reference provisions secret values server-side; locally the
    * declared name IS the bearer credential. Several pipes can share
    * one token (the kits' "Dashboard_Read"). */
  private val TokenRe = """TOKEN\s+"([^"]+)"\s+READ""".r

  def tokensFromPipes(pipes: Seq[(String, String)]): Map[String, Set[String]] =
    pipes.flatMap { case (pipeName, text) =>
      TokenRe.findAllMatchIn(text).map(m => m.group(1) -> pipeName)
    }.groupBy(_._1).map { case (tok, grants) => tok -> grants.map(_._2).toSet }
}
