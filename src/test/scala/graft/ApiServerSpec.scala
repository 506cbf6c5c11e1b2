package graft

import graft.sources.ApiServer
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The served read-API surface: Bearer auth, pipe listing, payload
  * fetch, parameter passing, and the reference's status semantics
  * (tb_functions.py raise_for_status contract: 401/403/404/400). */
class ApiServerSpec extends SparkSpec {

  private lazy val tokens = Map(
    "admin_token" -> Set("*"),
    "events_read" -> Set("events_by_type_status"),
    "dedup_read" -> Set("docs_near_dup_pairs"))
  private lazy val api = new ApiServer(spark, sf, tokens)
  private lazy val port = api.start()
  private val http = HttpClient.newHttpClient()

  private def get(path: String, token: Option[String]): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    http.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  test("endpoint fetch returns the payload document (meta, data, rows)") {
    val r = get("/v0/pipes/events_by_type_status.json", Some("events_read"))
    assert(r.statusCode() == 200, r.body())
    assert(r.body().contains("\"meta\":[") && r.body().contains("\"data\":["))
    assert("\"rows\":(\\d+)".r.findFirstMatchIn(r.body())
      .exists(_.group(1).toInt > 0))
  }

  test("pipe listing is scoped to the token's grants") {
    val admin = get("/v0/pipes", Some("admin_token"))
    assert(admin.statusCode() == 200)
    assert("\"name\"".r.findAllIn(admin.body()).size ==
      SparkEntry.queries.size)
    val scoped = get("/v0/pipes", Some("events_read"))
    assert("\"name\"".r.findAllIn(scoped.body()).size == 1)
    assert(scoped.body().contains("events_by_type_status"))
  }

  test("query params reach the parameterized endpoints") {
    val loose = get("/v0/pipes/docs_near_dup_pairs.json?min_jaccard=0.5",
      Some("dedup_read"))
    val tight = get("/v0/pipes/docs_near_dup_pairs.json?min_jaccard=0.99",
      Some("dedup_read"))
    assert(loose.statusCode() == 200 && tight.statusCode() == 200)
    def rows(b: String) =
      "\"rows\":(\\d+)".r.findFirstMatchIn(b).get.group(1).toInt
    assert(rows(tight.body()) <= rows(loose.body()))
  }

  test("format suffixes: .csv and .ndjson render the same rows as .json") {
    val json = get("/v0/pipes/events_by_type_status.json", Some("events_read"))
    val csv = get("/v0/pipes/events_by_type_status.csv", Some("events_read"))
    val nd = get("/v0/pipes/events_by_type_status.ndjson", Some("events_read"))
    assert(csv.statusCode() == 200 && nd.statusCode() == 200)
    assert(csv.headers().firstValue("Content-Type").orElse("") == "text/csv")
    val rows = "\"rows\":(\\d+)".r.findFirstMatchIn(json.body()).get.group(1).toInt
    assert(csv.body().trim.split("\n").length == rows + 1, "header + one line per row")
    assert(nd.body().trim.split("\n").length == rows)
    assert(nd.body().linesIterator.forall(_.startsWith("{")))
  }

  test("non-GET methods are 405: the read API never executes on a write verb") {
    val r = http.send(
      HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/v0/pipes/events_by_type_status.json"))
        .header("Authorization", "Bearer events_read")
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 405, r.body())
  }

  test("status semantics: 401 unknown token, 403 out of scope, 404 no pipe, 400 bad param") {
    assert(get("/v0/pipes/events_by_type_status.json", None).statusCode() == 401)
    assert(get("/v0/pipes/events_by_type_status.json", Some("wrong")).statusCode() == 401)
    assert(get("/v0/pipes/docs_near_dup_pairs.json", Some("events_read")).statusCode() == 403)
    assert(get("/v0/pipes/no_such_pipe.json", Some("admin_token")).statusCode() == 404)
    assert(get("/v0/pipes/docs_near_dup_pairs.json?min_jacard=0.6",
      Some("dedup_read")).statusCode() == 400)
    assert(get("/v0/pipes/events_by_type_status.json?foo=1",
      Some("events_read")).statusCode() == 400)
  }

  test("concurrent requests are served in parallel, all successfully") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val codes = Await.result(
      Future.sequence(Seq.fill(6)(Future(
        get("/v0/pipes/events_by_type_status.json", Some("events_read"))
          .statusCode()))),
      2.minutes)
    assert(codes.forall(_ == 200), codes.toString)
  }

  test("TOKEN declarations parse from the reference kit pipes") {
    val kit = new java.io.File("/root/reference/kits/airport/mysql/pipes")
    val pipes = kit.listFiles().filter(_.getName.endsWith(".pipe")).toSeq
      .map(f => f.getName.stripSuffix(".pipe") ->
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    val toks = ApiServer.tokensFromPipes(pipes)
    // the shared dashboard token covers several pipes; per-endpoint
    // tokens cover exactly one
    assert(toks("Dashboard_Read").size >= 2)
    assert(toks.exists { case (name, grants) =>
      name.contains("endpoint_read") && grants.size == 1 })
  }
}
