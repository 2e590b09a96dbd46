package graft.engine

import graft.SparkSpec
import graft.ingest.BulkIngest
import graft.model.{IndexType, SeqMapping}

/** Seeded replay of the reference's randomized sub-search property
  * test (tests/integration_tests/sub_search_test.go:84-165
  * `TestSubSearch`): docs spread over a 23 h span, then random 12 h
  * windows checked against a driver-side oracle on three axes —
  * page size is min(limit, in-range), with_total is the exact
  * in-range count, and the histogram equals the reference's binning
  * rule `t -= t % interval` bucket-for-bucket. The reference uses a
  * wall-clock seed; here the seed is fixed so the 40 windows are
  * reproducible, while still sweeping window positions that start and
  * end inside, at, and beyond fraction boundaries.
  */
class SubSearchPropertySpec extends SparkSpec {

  private val mapping = SeqMapping.of(
    "service" -> IndexType.Keyword,
    "message" -> IndexType.Text)

  private val baseMs = 1709900000000L
  private val spacingMs = 41400L // 2000 docs * 41.4 s = 23 h
  private val nDocs = 2000
  private lazy val docTimes: Seq[Long] = (0 until nDocs).map(baseMs + _ * spacingMs)

  private lazy val engine: SeqEngine = {
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
    val lines = docTimes.zipWithIndex.map { case (ts, i) =>
      s"""{"timestamp":"${fmt.format(java.time.Instant.ofEpochMilli(ts))}",""" +
        s""""service":"x${i % 100}","message":"doc $i"}"""
    }
    new SeqEngine(BulkIngest.ingest(lines.toDF("value"), mapping,
      baseMs + 24L * 3600 * 1000))
  }

  test("sub_search_test.go TestSubSearch: random 12h windows match the driver oracle") {
    val rnd = new scala.util.Random(42)
    val limit = 200
    val intervalMs = 3L * 60 * 1000
    for (attempt <- 0 until 40) {
      val f = baseMs + rnd.between(0L, 23L * 3600) * 1000
      val t = f + 12L * 3600 * 1000
      val inRange = docTimes.filter(ts => ts >= f && ts <= t)
      val page = engine.search(SearchRequest("service:*", f, t, size = limit)).count()
      assert(page == math.min(limit, inRange.size), s"attempt $attempt page [$f,$t]")
      assert(engine.total("service:*", f, t).head.getLong(0) == inRange.size,
        s"attempt $attempt total [$f,$t]")
      val hist = engine.histogram("service:*", f, t, intervalMs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = inRange.groupBy(ts => ts - ts % intervalMs)
        .view.mapValues(_.size.toLong).toMap
      assert(hist == expected, s"attempt $attempt histogram [$f,$t]")
    }
  }
}
