package graft.server

import java.io.InputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{DocsTable, SearchRequest, SeqEngine}
import graft.ingest.BulkIngest
import graft.model.SeqMapping

/** ES-compatible HTTP facade (SURVEY.md §2.1 S2): the endpoints the
  * reference's ingestor serves so logstash/filebeat/file.d can ship to
  * it (proxyapi/http_server.go:61-90):
  *
  *   - `POST /_bulk` — NDJSON ingest (gzip supported,
  *     proxyapi/http_bulk.go:112); action lines are stripped, documents
  *     are stamped/projected/tokenized per the mapping and appended to
  *     the parquet sink.
  *   - `/_ilm/policy*`, `/_index_template*`, `/_ingest*`, `/_nodes*` —
  *     `{}` fakes for Filebeat/Logstash setup probes.
  *   - `GET /` — cluster handshake (HEAD = empty logstash ping);
  *     `GET /_license` — basic license blob.
  *   - `POST /search` — where the reference forwards to its gRPC
  *     gateway, the facade exposes the engine's search as JSON
  *     ({query, from, to, size, offset, asc} → rows of (id, mid, rid,
  *     _raw)) so the whole read path is reachable over HTTP too.
  *
  * The facade is deliberately thin: one process-wide handler delegating
  * to [[BulkIngest]] and [[SeqEngine]]; durability and layout come from
  * the parquet sink, not from the server.
  */
final class EsHttpFacade(
    spark: SparkSession,
    mapping: SeqMapping,
    sinkDir: String,
    esVersion: String = "8.9.0") {

  @volatile private var server: HttpServer = _

  def port: Int = server.getAddress.getPort

  def start(requestedPort: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", requestedPort), 0)
    server.createContext("/", new RootHandler)
    server.setExecutor(null) // serial — ingest bulks are already batched
    server.start()
    port
  }

  def stop(): Unit = if (server != null) server.stop(0)

  /** Docs table over everything ingested so far. */
  def table: DocsTable = DocsTable(spark.read.parquet(sinkDir), mapping)

  private def body(ex: HttpExchange): String = {
    val raw: InputStream =
      if (Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
          .exists(_.equalsIgnoreCase("gzip")))
        new GZIPInputStream(ex.getRequestBody)
      else ex.getRequestBody
    new String(raw.readAllBytes(), StandardCharsets.UTF_8)
  }

  private def reply(ex: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private final class RootHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val path = ex.getRequestURI.getPath
      if (path == "/_bulk") handleBulk(ex)
      else if (path.startsWith("/_ilm/policy") || path.startsWith("/_index_template") ||
               path.startsWith("/_ingest") || path.startsWith("/_nodes"))
        reply(ex, 200, "{}")
      else if (path == "/") {
        if (ex.getRequestMethod == "HEAD") { ex.sendResponseHeaders(200, -1); ex.close() }
        else reply(ex, 200,
          s"""{"cluster_name": "graft","version": {"number": "$esVersion"}}""")
      }
      else if (path == "/_license")
        reply(ex, 200,
          """{"license":{"mode":"basic","status":"active","type":"basic"}}""")
      else if (path == "/search") handleSearch(ex)
      else reply(ex, 400, """{"error":"unsupported endpoint"}""")
    } catch {
      case e: Throwable =>
        reply(ex, 500, s"""{"error":${quote(e.getMessage)}}""")
    }

    private def handleBulk(ex: HttpExchange): Unit = {
      import spark.implicits._
      val t0 = System.nanoTime()
      val lines = body(ex).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      val df = lines.toDF("value")
      // ES contract: one items entry per bulk action (= per document
      // line). Counted from the request itself, NOT from the surviving
      // ingested rows, so a doc line the projection drops still gets
      // its items slot and counts never diverge from what the shipper
      // sent.
      val actionRe = """^\s*\{\s*"(index|create|update|delete)"\s*:""".r
      val nActions = lines.count(l => actionRe.findFirstIn(l).isEmpty)
      BulkIngest.project(df, mapping, requestTimeMs = System.currentTimeMillis())
        .write.mode("append").parquet(sinkDir)
      val tookMs = (System.nanoTime() - t0) / 1000000
      // stream the repeated item template instead of building an O(n)
      // response string on the heap (the request body is already the
      // unavoidable buffered allocation)
      val head = s"""{"took":$tookMs,"errors":false,"items":["""
        .getBytes(StandardCharsets.UTF_8)
      val item = """{"index":{"status":201}}""".getBytes(StandardCharsets.UTF_8)
      val comma = ",".getBytes(StandardCharsets.UTF_8)
      val tailB = "]}".getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, 0) // chunked
      val out = new java.io.BufferedOutputStream(ex.getResponseBody, 64 * 1024)
      out.write(head)
      var i = 0
      while (i < nActions) {
        if (i > 0) out.write(comma)
        out.write(item)
        i += 1
      }
      out.write(tailB)
      out.flush()
      ex.close()
    }

    private def handleSearch(ex: HttpExchange): Unit = {
      val req = parseSearch(body(ex))
      val eng = new SeqEngine(table)
      val page = eng.withIdString(eng.search(req))
        .select(col("id"), col("mid"), col("rid"), col("_raw"))
        .collect()
      val hits = page.map { r =>
        s"""{"id":${quote(r.getString(0))},"mid":${r.getLong(1)},"rid":${r.getLong(2)},"doc":${quote(r.getString(3))}}"""
      }.mkString(",")
      reply(ex, 200, s"""{"total":${page.length},"hits":[$hits]}""")
    }
  }

  /** Minimal JSON field extraction for the flat search request —
    * avoids a JSON library dependency (none are allowed anyway). */
  private def parseSearch(json: String): SearchRequest = {
    def str(k: String): Option[String] =
      ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(json).map(m => graft.model.Json.unescape(m.group(1)))
    def num(k: String): Option[Long] =
      ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(json).map(_.group(1).toLong)
    def bool(k: String): Option[Boolean] =
      ("\"" + k + "\"\\s*:\\s*(true|false)").r.findFirstMatchIn(json).map(_.group(1).toBoolean)
    SearchRequest(
      query = str("query").getOrElse("*"),
      fromMs = num("from").getOrElse(0L),
      toMs = num("to").getOrElse(Long.MaxValue),
      size = num("size").getOrElse(100L).toInt,
      offset = num("offset").getOrElse(0L).toInt,
      asc = bool("asc").getOrElse(false))
  }

  private def quote(s: String): String = graft.model.Json.quote(s)
}
