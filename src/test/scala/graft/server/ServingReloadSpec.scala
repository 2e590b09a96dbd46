package graft.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.model.{IndexType, SeqMapping}

/** Serving-mode operational behaviors from the round-6 verdict list:
  * mapping hot-reload (the reference re-reads its mapping file on a
  * timer and swaps it live, mappingprovider/mapping_provider.go:96-110
  * — here the file's signature rides the 1 s sink-generation probe)
  * and the pinned-sink byte cap (a 100×-scale sink must degrade to
  * DISK_ONLY instead of flooding executor memory).
  */
class ServingReloadSpec extends SparkSpec {

  private val client = HttpClient.newHttpClient()

  private def searchBody(port: Int, query: String): (Int, String) = {
    val r = client.send(HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/search"))
      .POST(HttpRequest.BodyPublishers.ofString(
        s"""{"query":"$query","from":0,"to":${Long.MaxValue},"size":10}"""))
      .build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("mapping hot-reload: a field added to the file becomes ingestable and searchable without restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reload")
    val mappingFile = dir.resolve("mapping.yaml")
    def writeMapping(extra: String): Unit =
      java.nio.file.Files.writeString(mappingFile,
        s"""mapping-list:
           |  - name: service
           |    type: keyword
           |  - name: level
           |    type: keyword
           |  - name: message
           |    type: text
           |$extra""".stripMargin)
    writeMapping("")
    val sink = dir.toString + "/docs"
    val srv = new EsHttpFacade(spark, SeqMapping.loadYaml(mappingFile.toString),
      sink, serving = true, mappingPath = Some(mappingFile.toString))
    srv.start()
    try {
      val ts = java.time.Instant.ofEpochMilli(System.currentTimeMillis()).toString
      def bulk(json: String): Unit = {
        val r = client.send(HttpRequest.newBuilder(
            URI.create(s"http://127.0.0.1:${srv.port}/_bulk"))
          .POST(HttpRequest.BodyPublishers.ofString(json + "\n")).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() == 200, r.body())
      }
      bulk(s"""{"timestamp":"$ts","service":"api","level":"error","message":"one"}""")
      assert(searchBody(srv.port, "level:error")._2.contains("\"total\":1"))
      // `region` is not in the mapping yet: the unindexed-field
      // rejection (F11) must fire through the live server
      val (preCode, preBody) = searchBody(srv.port, "region:eu")
      assert(preCode == 500 && preBody.contains("not indexed"), s"$preCode $preBody")

      writeMapping(
        """  - name: region
          |    type: keyword""".stripMargin)
      Thread.sleep(1100) // the generation probe's staleness bound
      // a NEW doc carrying the new field is projected under the
      // reloaded mapping and immediately searchable by it
      bulk(s"""{"timestamp":"$ts","service":"api","level":"error","message":"two","region":"eu"}""")
      val (code, bodyS) = searchBody(srv.port, "region:eu")
      assert(code == 200 && bodyS.contains("\"total\":1"), s"$code $bodyS")

      // same reloaded mapping through the gRPC server sharing the core
      val gapi = new grpc.GrpcSeqApi(spark, srv.table,
        dir.toString + "/_async", serving = Some(srv.core))
      val gport = gapi.start()
      val gclient = new grpc.GrpcSeqClient("127.0.0.1", gport, gapi)
      try {
        import grpc.SeqProxyProto._
        val sr = gclient.search(PSearchRequest(
          SearchQuery("region:eu", 0L, Long.MaxValue),
          size = 10, offset = 0, withTotal = true, asc = false))
        assert(sr.total == 1, sr)
      } finally { gclient.close(); gapi.stop() }
    } finally srv.stop()
  }

  test("serving pin byte-cap: a sink above maxPinnedBytes degrades to DISK_ONLY with identical results") {
    import org.apache.spark.storage.StorageLevel
    import org.apache.spark.sql.functions._
    val mapping = SeqMapping.of("level" -> IndexType.Keyword)
    val sink = java.nio.file.Files.createTempDirectory("graft_pin").toString + "/docs"
    spark.range(100)
      .select(col("id").as("mid"), col("id").as("rid"),
        when(col("id") % 2 === 0, "error").otherwise("info").as("level"))
      .write.parquet(sink)

    val pinned = new ServingCore(spark, mapping, sink)
    val n = pinned.engine.matches("level:error", 0L, Long.MaxValue).count()
    assert(pinned.engine.table.df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // unpersist before building the capped core: the CacheManager
    // would otherwise keep serving the plan at its first-registered
    // storage level and silently ignore the second persist()
    pinned.engine.table.df.unpersist(blocking = true)

    spark.conf.set("spark.graft.serving.maxPinnedBytes", "1")
    try {
      val capped = new ServingCore(spark, mapping, sink)
      assert(capped.engine.table.df.storageLevel == StorageLevel.DISK_ONLY)
      assert(capped.engine.matches("level:error", 0L, Long.MaxValue).count() == n)
      capped.engine.table.df.unpersist()
    } finally {
      spark.conf.unset("spark.graft.serving.maxPinnedBytes")
    }
  }
}
