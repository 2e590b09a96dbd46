package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.ingest.BulkIngest
import graft.model.{IndexType, SeqMapping}

/** The serving-mode incremental page scan: when the newest-day window
  * cannot fill the requested page, the loop must widen (1 → 4 → 16 →
  * all days) and return EXACTLY what the plain full-range path returns
  * — the early-termination optimization is not allowed to change a
  * single row.
  */
class ServingPageSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = SeqMapping.of(
    "level"   -> IndexType.Keyword,
    "message" -> IndexType.Text,
  ).copy(caseSensitive = false)

  test("day-window widening returns the exact full-range page") {
    // 6 days; day d carries d 'error' docs (newest day has only 1) —
    // a size-5 page cannot be served from the newest window alone
    val reqTime = 1710072000000L // 2024-03-10T12:00Z
    val lines = (for {
      d <- 1 to 6
      i <- 1 to d
    } yield {
      val day = 10 - (d - 1)
      f"""{"timestamp":"2024-03-$day%02d 0$i:00:00","level":"error","message":"doc day$d n$i"}"""
    }).toSeq
    val sink = java.nio.file.Files.createTempDirectory("srv_page").toString + "/docs"
    BulkIngest.ingestPartitioned(lines.toDF("value"), mapping, reqTime, sink,
      allowedDriftMs = 30L * 86400 * 1000)

    val plain = new EsHttpFacade(spark, mapping, sink)
    val srv = new EsHttpFacade(spark, mapping, sink, serving = true)
    plain.start(); srv.start()
    val client = HttpClient.newHttpClient()
    def post(port: Int, body: String): String =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/search"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString()).body()
    try {
      // sizes that force: newest-day only (1), the 4-day window (5),
      // the full range (15 with offset), plus offset slicing
      for (body <- Seq(
        s"""{"query":"level:error","from":0,"to":${Long.MaxValue},"size":1}""",
        s"""{"query":"level:error","from":0,"to":${Long.MaxValue},"size":5}""",
        s"""{"query":"level:error","from":0,"to":${Long.MaxValue},"size":15,"offset":3}""",
        s"""{"query":"level:error","from":0,"to":${Long.MaxValue},"size":4,"offset":2,"asc":true}""",
        s"""{"query":"message:day3","from":0,"to":${Long.MaxValue},"size":10}""",
      )) {
        assert(post(srv.port, body) == post(plain.port, body), body)
      }
    } finally { plain.stop(); srv.stop() }
  }
}
