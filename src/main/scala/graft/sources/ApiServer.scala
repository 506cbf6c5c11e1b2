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
                      rowLimit: Int = 10000,
                      datasourceDirs: Map[String, String] = Map.empty) {

  /** Parameterized pipes route through [[ParamEndpoints]]; everything
    * registered routes through the plain query registry (rejecting
    * params — a typo'd threshold must not silently return defaults). */
  private val parameterized: Map[String, (SparkSession, String, Map[String, String]) => DataFrame] = Map(
    "docs_near_dup_pairs" -> (ParamEndpoints.docsNearDupPairs _),
    "docs_minhash_lsh_pairs" -> (ParamEndpoints.docsMinhashLshPairs _),
    "emb_near_dup_pairs" -> (ParamEndpoints.embNearDupPairs _),
    "emb_knn_ivf" -> (ParamEndpoints.embKnnIvf _),
    "events_in_window" -> (ParamEndpoints.eventsInWindow _),
    "docs_bm25_search" -> (ParamEndpoints.docsBm25Search _),
    "ref_flights_missed_pct_minute" -> (ParamEndpoints.refFlightsMissedPctMinute _),
    "user_window_features" -> (ParamEndpoints.userWindowFeatures _),
    "docs_bm25_rerank" -> (ParamEndpoints.docsBm25Rerank _))

  /** Control-plane state (`POST /v0/datafiles` — tb_functions.py's
    * create_datasource/create_pipe at modules/tb_functions.py:225-252):
    * pipes provisioned at runtime as parsed NODE sequences, their TOKEN
    * grants, and parsed datasource definitions. */
  @volatile private var dynamicPipes = Map.empty[String, Seq[graft.sql.PipeRunner.Node]]
  @volatile private var dynamicTokens = Map.empty[String, Set[String]]
  @volatile private var datasources = Map.empty[String, KitParser.DatasourceDef]
  // token lifecycle (tb_functions.py:321-354): constructor tokens are
  // revocable too — deletion lands here rather than mutating the
  // caller's map, and authorized() checks it before any grant applies
  @volatile private var revokedTokens = Set.empty[String]
  // once a constructor name is revoked its ORIGINAL grants are dead
  // forever: re-creation must yield exactly the POSTed scope, never a
  // union with the constructor entry (that union would silently hand a
  // narrowly re-scoped credential its old workspace-admin grant back —
  // a revocation bypass). Entries here permanently mask the
  // constructor map in liveTokens; dynamicTokens alone defines the
  // re-created credential.
  @volatile private var supersededTokens = Set.empty[String]
  // reads stay lock-free on the volatiles; every read-modify-write goes
  // through this lock — two concurrent POSTs on the request pool would
  // otherwise each publish snapshot+own-entry and silently drop the
  // other's pipe/token/datasource (lost update, not last-write-wins)
  private val stateLock = new Object

  private def pipeNames: Seq[String] =
    (graft.SparkEntry.queries.keys ++ dynamicPipes.keys).toSeq.sorted

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/v0/pipes", (ex: HttpExchange) => handle(ex))
    s.createContext("/v0/datafiles", (ex: HttpExchange) => handleDatafiles(ex))
    s.createContext("/v0/tokens", (ex: HttpExchange) => handleTokens(ex))
    s.createContext("/v0/datasources", (ex: HttpExchange) => handleDatasources(ex))
    s.createContext("/v0/dedup_artifacts",
      (ex: HttpExchange) => handleDedupArtifacts(ex))
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
    if (viewsBuilt)
      servingViews.foreach(n =>
        spark.catalog.dropGlobalTempView(s"graft_serving_${viewTag}_$n"))
  }

  /** One catch discipline for every handler. NOTE: callers must not
    * `return` inside `body` — a non-local return from the closure
    * would be swallowed by the Throwable arm as a 500. An
    * AnalysisException reaching THIS handler is a server-side defect
    * (e.g. a registry query referencing a dropped serving view) and
    * is logged as a 500; analysis failures caused by CLIENT input go
    * through [[clientSql]] at the sites where the SQL or params are
    * client-supplied, which remaps them to 400. */
  private def guarded(ex: HttpExchange)(body: => Unit): Unit =
    try body catch {
      // String.valueOf: an IAE raised inside Spark can carry a null
      // message, and an NPE inside a handler would abandon the
      // exchange with no response at all (client hangs to EOF)
      case e: IllegalArgumentException =>
        respond(ex, 400, s"""{"error":${Endpoints.q(String.valueOf(e.getMessage))}}""")
      case e: Throwable =>
        // generic body: raw internal messages leak paths/plan fragments
        // to any authenticated client; the detail goes to the server log
        System.err.println(s"[api] 500 on ${ex.getRequestURI}: $e")
        respond(ex, 500, """{"error":"internal error"}""")
    }

  /** Scope the AnalysisException→400 mapping to where it belongs:
    * execution whose SQL or params are CLIENT-supplied (a pushed
    * pipe's text, template params, a `k=-1` that only surfaces at
    * Spark's LIMIT analysis). Wrapping exactly these sites — instead
    * of mapping every AnalysisException in [[guarded]] — keeps a
    * genuine server defect on the read path (a registry query against
    * a stale view) as a logged 500 rather than silently blaming the
    * client. */
  private def clientSql[A](body: => A): A =
    try body catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(String.valueOf(e.getMessage))
    }

  private def handle(ex: HttpExchange): Unit = guarded(ex) {
    if (ex.getRequestMethod != "GET") {
      // the read API is GET-only (tb_functions.py uses requests.get
      // for every pipe read; DELETE/POST address the control plane,
      // which is out of engine scope)
      respond(ex, 405, """{"error":"read API is GET-only"}""")
    } else {
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
          // snapshot ONCE: a concurrent DELETE /v0/datafiles between a
          // contains() check and a later lookup would turn the race
          // into a 500 instead of this request just seeing one side
          val dynNodes = dynamicPipes.get(name)
          if (!graft.SparkEntry.queries.contains(name) && dynNodes.isEmpty)
            respond(ex, 404, s"""{"error":"pipe not found: $name"}""")
          else if (!(grants("*") || grants(name)))
            respond(ex, 403, s"""{"error":"token lacks READ on $name"}""")
          else {
            val params = queryParams(ex)
            // client-shaped = the SQL or its params came from the
            // request (pushed pipe, template params): analysis errors
            // there are 400s. A bare registry query with no params has
            // NO client-controlled analysis surface — its failures are
            // server defects and stay logged 500s (render runs inside
            // the wrap because Spark raises most analysis errors at
            // action time, not at DataFrame construction).
            val clientShaped =
              parameterized.contains(name) || dynNodes.isDefined
            def render(): (Endpoints.Rendered, String) = {
              val df = parameterized.get(name) match {
                case Some(f) => f(spark, sfDir, params)
                case None => dynNodes match {
                  case Some(nodes) => runDynamic(name, nodes, params)
                  case None =>
                    require(params.isEmpty,
                      s"pipe $name takes no parameters: ${params.keys.mkString(", ")}")
                    graft.SparkEntry.queries(name)(spark, sfDir)
                }
              }
              format match {
                case "csv" => (Endpoints.renderCsv(df, rowLimit), "text/csv")
                case "ndjson" =>
                  (Endpoints.renderNdjson(df, rowLimit), "application/x-ndjson")
                case _ => (Endpoints.renderJson(df, rowLimit), "application/json")
              }
            }
            val rendered = if (clientShaped) clientSql(render()) else render()
            // envelope-less formats signal a clipped result via header
            // (the .json envelope carries rows_before_limit_at_least)
            if (rendered._1.overflow)
              ex.getResponseHeaders.set("X-Rows-Before-Limit-At-Least",
                String.valueOf(rowLimit + 1))
            respond(ex, 200, rendered._1.body, rendered._2)
          }
      }
    }
  }

  /** The control plane: `POST /v0/datafiles?name=<file>.pipe|.datasource`
    * with the kit-file text as the body (the engine-side of
    * tb_functions.py:225-252's file push), `DELETE /v0/datafiles/{name}`,
    * `GET /v0/datafiles` to list. Write verbs require a workspace-admin
    * token (a `*` grant — the reference's admin token manages datafiles
    * and tokens, tb_functions.py:321-354). A POSTed pipe is parsed,
    * ANALYZED against the serving views (bad SQL 400s at push time, not
    * first fetch), its TOKEN declarations become live bearer grants, and
    * it serves immediately at `/v0/pipes/{name}` in every format. */
  private def handleDatafiles(ex: HttpExchange): Unit = guarded(ex) {
      authorized(ex) match {
        case None => respond(ex, 401, """{"error":"invalid or missing token"}""")
        case Some(grants) if !grants("*") =>
          respond(ex, 403, """{"error":"datafiles require a workspace admin token"}""")
        case Some(_) =>
          val path = ex.getRequestURI.getPath
          ex.getRequestMethod match {
            case "GET" =>
              val items =
                (dynamicPipes.keys.map(n => s"""{"name":${Endpoints.q(n + ".pipe")}}""") ++
                  datasources.keys.map(n => s"""{"name":${Endpoints.q(n + ".datasource")}}"""))
                  .toSeq.sorted.mkString("[", ",", "]")
              respond(ex, 200, s"""{"datafiles":$items}""")
            case "POST" =>
              val fileName = queryParams(ex).getOrElse("name",
                throw new IllegalArgumentException("missing ?name=<file>.pipe|.datasource"))
              val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
              if (fileName.endsWith(".pipe")) {
                val pipeName = fileName.stripSuffix(".pipe")
                // a name like `*` would make its TOKEN declarations
                // workspace-admin grants (the `grants("*")` check), and
                // dots collide with the format-suffix parser
                require(pipeName.matches("[A-Za-z0-9_]+"),
                  s"invalid pipe name (want [A-Za-z0-9_]+): $pipeName")
                val nodes = graft.sql.PipeRunner.parse(body)
                require(nodes.nonEmpty, s"no SQL nodes in $fileName")
                require(!graft.SparkEntry.queries.contains(pipeName),
                  s"$pipeName shadows a built-in pipe")
                // analyze now: a pipe that doesn't resolve must 400 at
                // push time, not surprise the first dashboard fetch.
                // Required template params get type-shaped placeholders
                // (a pipe with a bare {{DateTime(start)}} is legal — the
                // param arrives with the fetch); the no-params pass then
                // covers the {% else %} branches, tolerating only the
                // unbound-param error that a required-param pipe raises
                // by construction.
                val tmpl = graft.sql.ChSqlTranslator.templateParams(
                  nodes.map(_.sql).mkString("\n"))
                val placeholders = tmpl.map { case (p, t) =>
                  p -> ApiServer.placeholderFor(t) }
                clientSql(
                  graft.sql.PipeRunner.runNodes(servingSession(), nodes, placeholders))
                if (placeholders.nonEmpty)
                  try clientSql(graft.sql.PipeRunner.runNodes(servingSession(), nodes))
                  catch {
                    case e: IllegalArgumentException
                      if String.valueOf(e.getMessage)
                        .startsWith("unbound template param") => ()
                  }
                val declared = ApiServer.tokensFromPipes(Seq(pipeName -> body))
                // a REVOKED name stays dead on a datafile push: locally
                // the token NAME is the secret, so re-enabling the
                // exact revoked string as a push side effect would
                // resurrect a leaked credential (the reference is safe
                // here only because re-provisioning mints a new
                // server-side secret). Re-issuing a revoked name takes
                // an explicit POST /v0/tokens; the push response names
                // what it skipped so the operator sees the gap.
                val (toks, skippedRevoked) = stateLock.synchronized {
                  val (dead, live) =
                    declared.partition { case (n, _) => revokedTokens(n) }
                  dynamicPipes += pipeName -> nodes
                  // overwriting an existing name is a ROTATION: grants
                  // minted by the PREVIOUS version die with it (the
                  // same invariant DELETE enforces) — a TOKEN line
                  // removed in v2 must not keep reading v2 via v1's
                  // grant (supersededTokens keeps any old constructor
                  // grants masked).
                  val rotated = dynamicTokens.flatMap { case (t, g) =>
                    val g2 = g - pipeName
                    if (g2.isEmpty) None else Some(t -> g2)
                  }
                  dynamicTokens = merge(rotated, live)
                  (live, dead.keys.toSeq.sorted)
                }
                respond(ex, 200, s"""{"name":${Endpoints.q(pipeName)},"type":"pipe","nodes":${nodes.length},"tokens":${toks.keys.toSeq.sorted.map(Endpoints.q).mkString("[", ",", "]")},"skipped_revoked_tokens":${skippedRevoked.map(Endpoints.q).mkString("[", ",", "]")}}""")
              } else if (fileName.endsWith(".datasource")) {
                val dsName = fileName.stripSuffix(".datasource")
                require(dsName.matches("[A-Za-z0-9_]+"),
                  s"invalid datasource name (want [A-Za-z0-9_]+): $dsName")
                val ds = KitParser.parseDatasource(dsName, body)
                stateLock.synchronized { datasources += dsName -> ds }
                val cols = ds.columns.map(c =>
                  s"""{"name":${Endpoints.q(c.name)},"type":${Endpoints.q(c.dataType.simpleString)}}""")
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"name":${Endpoints.q(dsName)},"type":"datasource","columns":$cols}""")
              } else throw new IllegalArgumentException(
                s"unsupported datafile (want .pipe or .datasource): $fileName")
            case "DELETE" =>
              val fileName = path.stripPrefix("/v0/datafiles/")
              val (pipeName, dsName) =
                (fileName.stripSuffix(".pipe"), fileName.stripSuffix(".datasource"))
              if (dynamicPipes.contains(pipeName)) {
                stateLock.synchronized {
                  dynamicPipes -= pipeName
                  // grants die with the pipe: a token it minted must not
                  // survive deletion and silently read a LATER pipe
                  // provisioned under the same name
                  dynamicTokens = dynamicTokens.flatMap { case (t, g) =>
                    val g2 = g - pipeName
                    if (g2.isEmpty) None else Some(t -> g2)
                  }
                }
                respond(ex, 200, s"""{"deleted":${Endpoints.q(pipeName)}}""")
              } else if (datasources.contains(dsName)) {
                stateLock.synchronized { datasources -= dsName }
                respond(ex, 200, s"""{"deleted":${Endpoints.q(dsName)}}""")
              } else respond(ex, 404, s"""{"error":"datafile not found: $fileName"}""")
            case _ => respond(ex, 405, """{"error":"datafiles support GET/POST/DELETE"}""")
          }
      }
  }

  /** Token lifecycle (tb_functions.py:321-354 — tokens_list GET /tokens,
    * tokens_delete DELETE /tokens/{name}; creation is the engine-side
    * analogue of the provisioning the reference does from pipe TOKEN
    * lines): admin-gated like datafiles. Locally the token NAME is the
    * bearer credential (the reference provisions secret values
    * server-side); grants are pipe names, `*` = workspace admin. */
  private def handleTokens(ex: HttpExchange): Unit = guarded(ex) {
      authorized(ex) match {
        case None => respond(ex, 401, """{"error":"invalid or missing token"}""")
        case Some(grants) if !grants("*") =>
          respond(ex, 403, """{"error":"token management requires a workspace admin token"}""")
        case Some(_) =>
          ex.getRequestMethod match {
            case "GET" =>
              val items = liveTokens.toSeq.sortBy(_._1).map { case (t, g) =>
                s"""{"name":${Endpoints.q(t)},"grants":${g.toSeq.sorted.map(Endpoints.q).mkString("[", ",", "]")}}"""
              }.mkString("[", ",", "]")
              respond(ex, 200, s"""{"tokens":$items}""")
            case "POST" =>
              val params = queryParams(ex)
              val name = params.getOrElse("name",
                throw new IllegalArgumentException("missing ?name=<token>"))
              require(name.matches("[A-Za-z0-9_]+"),
                s"invalid token name (want [A-Za-z0-9_]+): $name")
              val scope = params.getOrElse("pipes",
                throw new IllegalArgumentException(
                  "missing ?pipes=<pipe,pipe,...> (or pipes=* for admin)"))
              val granted = scope.split(",").filter(_.nonEmpty).toSet
              require(granted.nonEmpty, "empty pipes scope")
              granted.filterNot(_ == "*").foreach(p =>
                require(graft.SparkEntry.queries.contains(p) || dynamicPipes.contains(p),
                  s"unknown pipe in scope: $p"))
              stateLock.synchronized {
                require(!liveTokens.contains(name), s"token already exists: $name")
                // re-creation after revocation is a NEW credential
                revokedTokens -= name
                dynamicTokens = merge(dynamicTokens, Map(name -> granted))
              }
              respond(ex, 200,
                s"""{"name":${Endpoints.q(name)},"grants":${granted.toSeq.sorted.map(Endpoints.q).mkString("[", ",", "]")}}""")
            case "DELETE" =>
              val name = ex.getRequestURI.getPath.stripPrefix("/v0/tokens/")
              val known = stateLock.synchronized {
                if (liveTokens.contains(name)) {
                  // deleting the FINAL `*` token would permanently lock
                  // the control plane (creation itself is admin-gated,
                  // so there is no recovery short of restart); the
                  // reference similarly protects the workspace admin
                  require(
                    !(liveTokens(name)("*") &&
                      liveTokens.count(_._2("*")) == 1),
                    s"cannot delete the last workspace admin token: $name")
                  revokedTokens += name
                  dynamicTokens -= name
                  supersededTokens += name
                  true
                } else false
              }
              if (known) respond(ex, 200, s"""{"deleted":${Endpoints.q(name)}}""")
              else respond(ex, 404, s"""{"error":"token not found: $name"}""")
            case _ => respond(ex, 405, """{"error":"tokens support GET/POST/DELETE"}""")
          }
      }
  }

  /** Quarantine/datasource ops surface (tb_functions.py:137-155:
    * datasources_list reads `/datasources`, datasources_truncate POSTs
    * `/datasources/{name}/truncate`, quarantine tables are plain
    * datasources named `<ds>_quarantine`): GET lists the dir-backed
    * datasources (plus POSTed definitions), GET /{name} renders the
    * backing parquet rows, POST /{name}/truncate empties it. Admin-
    * gated like the reference's usage (always the workspace key). */
  private def handleDatasources(ex: HttpExchange): Unit = guarded(ex) {
      authorized(ex) match {
        case None => respond(ex, 401, """{"error":"invalid or missing token"}""")
        case Some(grants) if !grants("*") =>
          respond(ex, 403, """{"error":"datasource ops require a workspace admin token"}""")
        case Some(_) =>
          val tail = ex.getRequestURI.getPath.stripPrefix("/v0/datasources")
            .stripPrefix("/")
          (ex.getRequestMethod, tail) match {
            case ("GET", "") =>
              // dir-backed datasources serve rows and truncate; POSTed
              // definitions are schema-only until backed by data — the
              // listing says which is which so a client never 404s on a
              // name the server itself just listed without warning
              val names =
                (datasourceDirs.keys ++ datasources.keys).toSeq.distinct.sorted
              val items = names.map { n =>
                val backed = datasourceDirs.contains(n)
                s"""{"name":${Endpoints.q(n)},"readable":$backed,"kind":${
                  Endpoints.q(if (backed) "data" else "definition")}}"""
              }.mkString("[", ",", "]")
              respond(ex, 200, s"""{"datasources":$items}""")
            case ("GET", name) if !name.contains("/") =>
              datasourceDirs.get(name) match {
                case None if datasources.contains(name) =>
                  respond(ex, 404,
                    s"""{"error":"datasource $name is a definition with no data backing"}""")
                case None => respond(ex, 404, s"""{"error":"datasource not found: $name"}""")
                case Some(dir) =>
                  val d = new java.io.File(dir)
                  // listFiles is null if a concurrent truncate removes
                  // the dir between isDirectory and the listing
                  val hasData = d.isDirectory &&
                    Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
                      .exists(_.getName.endsWith(".parquet"))
                  if (!hasData)
                    // an empty/truncated quarantine is 0 rows, not an error
                    respond(ex, 200, """{"meta":[],"data":[],"rows":0}""")
                  else
                    respond(ex, 200,
                      Endpoints.renderJson(spark.read.parquet(dir), rowLimit).body)
              }
            case ("POST", t) if t.endsWith("/truncate") =>
              val name = t.stripSuffix("/truncate")
              datasourceDirs.get(name) match {
                case None if datasources.contains(name) =>
                  respond(ex, 404,
                    s"""{"error":"datasource $name is a definition with no data backing"}""")
                case None => respond(ex, 404, s"""{"error":"datasource not found: $name"}""")
                case Some(dir) =>
                  val d = new java.io.File(dir)
                  if (d.exists()) Layout.deleteRec(d)
                  d.mkdirs()
                  respond(ex, 200, s"""{"truncated":${Endpoints.q(name)}}""")
              }
            case _ => respond(ex, 405,
              """{"error":"datasources support GET and POST {name}/truncate"}""")
          }
      }
  }

  /** Maintenance observability — the resource-status surface next to
    * `/v0/datasources` (the reference's list/describe convention,
    * tb_functions.py:137-155) for the staged dedup artifacts: whether
    * they are CURRENT for this workspace's data dir (the read-side
    * routing predicate — exactly what decides if `emb_near_dup_pairs`
    * serves from the layout), the merge-on-read generation, whether a
    * crashed increment's journal is pending, and the last
    * [[graft.operators.DedupMaintenance.update]] outcome verbatim.
    * Read-only and cheap (file metadata, no Spark job), so any
    * authorized token may ask; 401 without one. */
  private def handleDedupArtifacts(ex: HttpExchange): Unit = guarded(ex) {
    val art = graft.SparkEntry.dedupArtifactsDir(sfDir)
    // currency is judged under the artifact's OWN staging params (the
    // stored fingerprint header) — an artifact maintained under
    // non-default minJaccard/maxDf must not read as perpetually stale
    // against the defaults. No stored params (fresh workspace) →
    // defaults, which is also what a first update() will build with.
    def params: (Double, Int) =
      graft.operators.TextDedup.storedParams(art).getOrElse((0.5, 100))
    def statusJson: String = {
      val (mj, df) = params
      val current = graft.operators.TextDedup.artifactsCurrent(
        sfDir, art, mj, df)
      val journal = java.nio.file.Files.exists(
        new java.io.File(art, "_INC_JOURNAL").toPath)
      val gen = graft.operators.TextDedup.readGen(art)
      val last = graft.operators.DedupMaintenance.lastIncrement(art)
        .getOrElse("null")
      s"""{"path":${Endpoints.q(art)},"current":$current,""" +
        s""""min_jaccard":$mj,"max_df":$df,""" +
        s""""generation":$gen,"journal_pending":$journal,""" +
        s""""last_update":$last}"""
    }
    val tail = ex.getRequestURI.getPath.stripPrefix("/v0/dedup_artifacts")
      .stripPrefix("/")
    authorized(ex) match {
      case None => respond(ex, 401, """{"error":"invalid or missing token"}""")
      case Some(_) if ex.getRequestMethod == "GET" && tail.isEmpty =>
        respond(ex, 200, statusJson)
      // maintenance ACTUATORS — provisioning-over-HTTP like the
      // reference's push/truncate surfaces (tb_functions.py:225-252),
      // so an operator brings artifacts current or bounds read
      // amplification without touching the JVM. Mutating → workspace
      // admin only (same gate as datasource truncate).
      case Some(grants) if ex.getRequestMethod == "POST" &&
          (tail == "update" || tail == "compact") =>
        if (!grants("*"))
          respond(ex, 403,
            """{"error":"dedup maintenance requires a workspace admin token"}""")
        else if (tail == "update") {
          val (mj, df) = params
          val mode = graft.operators.DedupMaintenance.update(
            spark, sfDir, art, mj, df)
          respond(ex, 200,
            s"""{"action":"update","mode":${Endpoints.q(mode)},""" +
              statusJson.stripPrefix("{"))
        } else {
          graft.operators.DedupMaintenance.compact(spark, art)
          respond(ex, 200,
            s"""{"action":"compact",""" + statusJson.stripPrefix("{"))
        }
      case Some(_) => respond(ex, 405,
        """{"error":"dedup_artifacts supports GET and POST update|compact"}""")
    }
  }

  /** Every live (non-revoked) token → grants. Constructor entries whose
    * name was ever revoked are masked (supersededTokens): a later
    * re-creation is a NEW credential with only its POSTed scope. */
  private def liveTokens: Map[String, Set[String]] =
    (merge(tokens -- supersededTokens, dynamicTokens) -- revokedTokens)

  /** Execute a provisioned pipe: a FRESH child session per request (own
    * temp-view namespace — concurrent pipes with colliding node names
    * cannot cross-talk; shares the SparkContext, so no startup cost)
    * with the serving views registered. Request params are validated
    * against the pipe's declared template params FIRST — the
    * translator ignores extra keys, so without this a typo'd param
    * would silently take the `{% else %}` default branch with a 200
    * (exactly the failure the registry path's no-params require
    * guards against). */
  private def runDynamic(name: String, nodes: Seq[graft.sql.PipeRunner.Node],
                         params: Map[String, String]): DataFrame = {
    val declared = graft.sql.ChSqlTranslator.declaredParams(
      nodes.map(_.sql).mkString("\n"))
    val unknown = params.keySet -- declared
    require(unknown.isEmpty,
      s"pipe $name does not take: ${unknown.toSeq.sorted.mkString(", ")}" +
        (if (declared.isEmpty) ""
         else s" (declared params: ${declared.toSeq.sorted.mkString(", ")})"))
    graft.sql.PipeRunner.runNodes(servingSession(), nodes, params)
  }

  /** The serving views, analyzed ONCE and published as global temp
    * views (visible to every child session): the harness star schema
    * under its table names, and the CDC fixture log's datasource tables
    * (raw logs + the users FINAL view + the copy-job snapshot — the
    * views the reference kit pipes query). Building these per request
    * would pay ~15 parquet schema resolutions (driver footer I/O) plus
    * the users-MV dedup plan on every dynamic-pipe fetch. */
  // per-instance namespace: two servers over different sfDirs share the
  // one global_temp catalog, so unprefixed names would cross-wire them
  private val viewTag = ApiServer.tagCounter.incrementAndGet()
  @volatile private var viewsBuilt = false

  private lazy val servingViews: Seq[String] = {
    def reg(name: String, df: DataFrame): String = {
      df.createOrReplaceGlobalTempView(s"graft_serving_${viewTag}_$name"); name
    }
    val base = for (t <- Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "documents", "embeddings"))
      yield reg(t, spark.read.parquet(s"$sfDir/$t.parquet"))
    val ev = reg("events", graft.Tables.events(spark, sfDir))
    val fx = graft.SparkEntry.fixtureDir(spark)
    val raw = for (t <- Seq("flights_raw", "passengers_raw",
        "baggage_raw", "users_raw"))
      yield reg(t, spark.read.parquet(s"$fx/$t"))
    val batch = reg("users_batch", spark.read.parquet(s"$fx/users_batch"))
    val mv = graft.pipes.UsersPipes.usersMv(
      graft.pipes.UsersPipes.usersRaw(spark, fx))
    val fin = reg("users_latest__final",
      graft.operators.Dedup.latestByKey(mv, Seq("id"),
          org.apache.spark.sql.functions.col("updated_at"),
          mv.columns.filter(_ != "id").toSeq)
        .select("id", "name", "email", "address", "phone_number",
          "email_verified", "onboarded", "deleted", "event_timestamp",
          "lang", "created_at", "updated_at"))
    viewsBuilt = true
    base ++ Seq(ev) ++ raw ++ Seq(batch, fin)
  }

  /** A child session per request (own temp-view namespace — concurrent
    * pipes with colliding node names cannot cross-talk) that aliases
    * the cached [[servingViews]] under their bare names: per-request
    * cost is a few catalog entries, not plan/schema rebuilds. */
  private def servingSession(): SparkSession = {
    val s = spark.newSession()
    for (n <- servingViews)
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $n AS " +
        s"SELECT * FROM global_temp.graft_serving_${viewTag}_$n")
    s
  }

  private def merge(a: Map[String, Set[String]],
                    b: Map[String, Set[String]]): Map[String, Set[String]] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, Set.empty) ++ b.getOrElse(k, Set.empty))).toMap

  /** Bearer token → its pipe grants, None when missing/unknown. Tokens
    * declared by POSTed pipes extend the constructor set. */
  private def authorized(ex: HttpExchange): Option[Set[String]] =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .filter(_.startsWith("Bearer "))
      .map(_.stripPrefix("Bearer "))
      .flatMap(liveTokens.get)

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

  private val tagCounter = new java.util.concurrent.atomic.AtomicInteger()

  def tokensFromPipes(pipes: Seq[(String, String)]): Map[String, Set[String]] =
    pipes.flatMap { case (pipeName, text) =>
      TokenRe.findAllMatchIn(text).map(m => m.group(1) -> pipeName)
    }.groupBy(_._1).map { case (tok, grants) => tok -> grants.map(_._2).toSet }

  /** Type-shaped placeholder for push-time analysis of a pipe whose
    * template params are required (no `{% if defined %}` guard). */
  private[sources] def placeholderFor(t: String): String = t match {
    case "DateTime" => "2024-01-01 00:00:00"
    case "Date" => "2024-01-01"
    case "String" => "x"
    case "Boolean" => "true"
    case _ => "0"
  }
}
