package graft.engine

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ingest.BulkIngest
import graft.model.{IndexType, SeqMapping}

/** The reference's OWN integration cases replayed end-to-end through
  * the real write path (BulkIngest) and read path (SeqEngine):
  *   - tests/integration_tests/single_test.go:41-77 `simpleCases` +
  *     :143-160 `assertSearch` — the basic-search table, including
  *     mid-token wildcards and the escaped-space + wildcard composite;
  *   - :225-258 `TestSearchNot` — the NOT algebra table;
  *   - :111-141 `TestSearchAgg` — per-token doc counts.
  * Expected hit lists are the reference's own, in its time-descending
  * result order.
  */
class ReferenceCasesSpec extends SparkSpec {

  private val mapping = SeqMapping.of(
    "docidx"  -> IndexType.Keyword,
    "service" -> IndexType.Keyword,
    "message" -> IndexType.Text,
    "traceID" -> IndexType.Keyword,
    "source"  -> IndexType.Keyword,
    "level"   -> IndexType.Keyword)

  private def linesDf(lines: String*) = {
    import spark.implicits._
    lines.toDF("value")
  }

  private val reqTime = 1710072000000L // 2024-03-10T12:00:00Z

  // simpleCases: timestamps +10/+30/+40/+20 (relative order preserved
  // at second granularity)
  private lazy val simpleEngine: SeqEngine = {
    def doc(idx: Int, service: String, message: String, traceId: String,
        source: String, level: Int, offsetS: Int): String =
      s"""{"timestamp":"2024-03-10 11:59:${String.format("%02d", Int.box(offsetS))}",""" +
        s""""docidx":"$idx","service":"$service","message":"$message",""" +
        s""""traceID":"$traceId","source":"$source","level":"$level"}"""
    new SeqEngine(BulkIngest.ingest(linesDf(
      doc(0, "service_a", "first message some text", "abcdef", "prod01", 1, 1),
      doc(1, "service_b", "second message other text", "abcdef", "prod01", 1, 3),
      doc(2, "service_c", "third message other text", "aaaaaa", "prod02", 2, 4),
      doc(3, "service_a", "fourth message some text", "bbbbbb", "prod01", 1, 2)
    ), mapping, reqTime))
  }

  private def hits(eng: SeqEngine, query: String): Seq[Int] =
    eng.search(SearchRequest(query, 0L, Long.MaxValue, size = 100))
      .select("docidx").collect().map(_.getString(0).toInt).toSeq

  test("single_test.go assertSearch: the reference's basic-search table") {
    val cases = Seq(
      "service: service_a"      -> Seq(3, 0),
      "traceID:abcdef"          -> Seq(1, 0),
      "level: 1"                -> Seq(1, 3, 0),
      "message: \"message text\"" -> Seq(2, 1, 3, 0),
      "message: \"other text\""   -> Seq(2, 1),
      "traceID: abcd*"          -> Seq(1, 0),
      "traceID: a*"             -> Seq(2, 1, 0),
      "traceID: a*f"            -> Seq(1, 0),
      "traceID: a*a"            -> Seq(2),
      "service: service*a"      -> Seq(3, 0),
      "message: message\\ som*" -> Seq(3, 0))
    for ((q, expected) <- cases)
      assert(hits(simpleEngine, q) == expected, s"query: $q")
  }

  test("single_test.go TestSearchAgg: per-token doc counts") {
    def agg(groupBy: String): Map[String, Long] =
      simpleEngine.aggregate("message:message", 0L, Long.MaxValue,
        AggRequest(AggFunc.Count, groupBy = Some(groupBy)))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg("service") == Map("service_a" -> 2L, "service_b" -> 1L, "service_c" -> 1L))
    assert(agg("level") == Map("1" -> 3L, "2" -> 1L))
  }

  test("integration_test.go TestSearchRange: legacy-brace ranges over levels 0,1,3,7,15,31,63") {
    val lines = Iterator.iterate(0)(i => 2 * i + 1).takeWhile(_ < 100).zipWithIndex.map {
      case (lvl, i) =>
        s"""{"timestamp":"2024-03-10 11:57:0$i","service":"test-service","level":"$lvl"}"""
    }.toSeq
    val eng = new SeqEngine(BulkIngest.ingest(linesDf(lines: _*), mapping, reqTime))
    val cases = Seq(
      "[1 TO 3]" -> 2, "[0 TO 3]" -> 3, "{0 TO 3}" -> 1, "{0 TO 3]" -> 2,
      "[0 TO 3}" -> 2, "[0 TO 63]" -> 7, "[-100 TO 100]" -> 7,
      "{-100 TO 100}" -> 7, "[0 TO *]" -> 7, "[0 TO *}" -> 7)
    for ((r, expected) <- cases) {
      assert(eng.matches(s"level:$r", 0L, Long.MaxValue).count() == expected, s"range $r")
      assert(eng.total(s"level:$r", 0L, Long.MaxValue).head.getLong(0) == expected, s"total $r")
    }
  }

  // TestSearchNot corpus: 6 docs, message good/bad alternating (even
  // idx = bad), level = idx+1, service = srv_{idx+1}, ascending time
  private lazy val notEngine: SeqEngine = {
    val lines = (0 until 6).map { i =>
      val msg = if (i % 2 == 0) "bad" else "good"
      s"""{"timestamp":"2024-03-10 11:58:0$i","docidx":"$i",""" +
        s""""service":"srv_${i + 1}","message":"$msg","level":"${i + 1}"}"""
    }
    new SeqEngine(BulkIngest.ingest(linesDf(lines: _*), mapping, reqTime))
  }

  test("single_test.go TestSearchNot: the reference's NOT algebra table") {
    val cases = Seq(
      "NOT level:1"      -> Seq(5, 4, 3, 2, 1),
      "NOT level:2"      -> Seq(5, 4, 3, 2, 0),
      "NOT level:5"      -> Seq(5, 3, 2, 1, 0),
      "NOT level:6"      -> Seq(4, 3, 2, 1, 0),
      "NOT message:notfound" -> Seq(5, 4, 3, 2, 1, 0),
      "NOT service:srv_*"    -> Seq(),
      "NOT message:bad"      -> Seq(5, 3, 1),
      "NOT message:good"     -> Seq(4, 2, 0),
      "NOT message:\"good bad\""             -> Seq(5, 4, 3, 2, 1, 0),
      "NOT (message:good AND message:bad)"   -> Seq(5, 4, 3, 2, 1, 0),
      "NOT (message:good OR message:bad)"    -> Seq(),
      "NOT message:bad AND message:bad"      -> Seq(),
      "NOT message:bad AND message:good"     -> Seq(5, 3, 1),
      "message:good AND NOT message:good"    -> Seq(),
      "message:bad AND NOT message:good"     -> Seq(4, 2, 0))
    for ((q, expected) <- cases)
      assert(hits(notEngine, q) == expected, s"query: $q")
  }

  // TestWildcardSymbols corpus (single_test.go:437-474): messages
  // mixing literal `*` runs with token boundaries; timestamps
  // ascending, so expected hit lists are time-descending
  private lazy val wildcardEngine: SeqEngine = {
    val msgs = Seq("first value:****", "second value:*******",
      "third value****", "fourth ****")
    val lines = msgs.zipWithIndex.map { case (m, i) =>
      s"""{"timestamp":"2024-03-10 11:58:1$i","docidx":"$i","message":"$m"}"""
    }
    new SeqEngine(BulkIngest.ingest(linesDf(lines: _*), mapping, reqTime))
  }

  test("single_test.go TestWildcardSymbols: the escaped-star wildcard table") {
    val cases = Seq(
      "message:*"                  -> Seq(3, 2, 1, 0),
      "message:value"              -> Seq(1, 0),
      "message:value*"             -> Seq(2, 1, 0),
      """message:value\*"""        -> Seq(),
      """message:value\**"""       -> Seq(2),
      """message:*\**"""           -> Seq(3, 2, 1, 0),
      """message:*e\**"""          -> Seq(2),
      """message:\**"""            -> Seq(3, 1, 0),
      """message:\*\*\*\*"""       -> Seq(3, 0),
      """message:\*\*\*\**"""      -> Seq(3, 1, 0),
      """message:value* AND message:\*\**""" -> Seq(1, 0),
      """message:value* OR message:\*\**"""  -> Seq(3, 2, 1, 0))
    for ((q, expected) <- cases)
      assert(hits(wildcardEngine, q) == expected, s"query: $q")
  }

  // TestSearchFromTo corpus (single_test.go:335-411): 8 docs at 1 ms
  // spacing; message good/bad alternating (even idx = bad),
  // traceID = idx/3, service = idx%3, level = idx+1. The table checks
  // that BOTH time bounds are INCLUSIVE and that asc/desc return the
  // same set in opposite order.
  private val fromToBaseMs = 1710071880000L // 2024-03-10T11:58:00Z
  private lazy val fromToEngine: SeqEngine = {
    val lines = (0 until 8).map { i =>
      val msg = if (i % 2 == 0) "bad" else "good"
      s"""{"timestamp":"2024-03-10 11:58:00.${"%03d".format(i)}","docidx":"$i",""" +
        s""""service":"${i % 3}","message":"$msg","traceID":"${i / 3}","level":"${i + 1}"}"""
    }
    new SeqEngine(BulkIngest.ingest(linesDf(lines: _*), mapping, reqTime))
  }

  test("single_test.go TestSearchFromTo: inclusive time bounds, asc/desc agreement") {
    def check(query: String, from: Int, to: Int, expected: Seq[Int]): Unit = {
      def run(asc: Boolean): Seq[Int] =
        fromToEngine.search(SearchRequest(query,
            fromToBaseMs + from, fromToBaseMs + to, size = 100, asc = asc))
          .select("docidx").collect().map(_.getString(0).toInt).toSeq
      assert(run(asc = false) == expected, s"desc: $query [$from,$to]")
      assert(run(asc = true) == expected.reverse, s"asc: $query [$from,$to]")
      assert(fromToEngine.total(query, fromToBaseMs + from, fromToBaseMs + to)
        .head.getLong(0) == expected.size, s"total: $query [$from,$to]")
    }
    check("message:good", 0, 7, Seq(7, 5, 3, 1))
    check("message:bad", 0, 7, Seq(6, 4, 2, 0))
    check("message:good", 0, 6, Seq(5, 3, 1))
    check("message:bad", 1, 7, Seq(6, 4, 2))
    check("message:good OR message:bad", 2, 6, Seq(6, 5, 4, 3, 2))
    check("message:good OR message:bad", 3, 3, Seq(3))
    check("NOT message:notexists", 0, 7, Seq(7, 6, 5, 4, 3, 2, 1, 0))
    check("NOT message:notexists", 0, 6, Seq(6, 5, 4, 3, 2, 1, 0))
    check("NOT message:notexists", 1, 7, Seq(7, 6, 5, 4, 3, 2, 1))
    check("NOT message:notexists", 1, 6, Seq(6, 5, 4, 3, 2, 1))
    check("NOT message:notexists AND message:*", 1, 6, Seq(6, 5, 4, 3, 2, 1))
    check("NOT message:notexists AND (message:* OR message:*)", 1, 6, Seq(6, 5, 4, 3, 2, 1))
    check("NOT message:notexists AND (message:good OR message:bad)", 1, 6, Seq(6, 5, 4, 3, 2, 1))
    check("NOT message:notexists AND message:good", 1, 6, Seq(5, 3, 1))
    check("NOT (message:good OR message:bad)", 0, 7, Seq())
    check("NOT (message:good OR message:bad)", 1, 6, Seq())
    check("NOT traceID:0", 0, 2, Seq())
    check("NOT traceID:0", 0, 3, Seq(3))
    check("NOT traceID:1", 3, 5, Seq())
    check("NOT traceID:1", 2, 6, Seq(6, 2))
    check("NOT traceID:0 AND NOT traceID:2", 0, 10, Seq(5, 4, 3))
    check("NOT traceID:0 AND NOT traceID:2", 3, 5, Seq(5, 4, 3))
  }
}
