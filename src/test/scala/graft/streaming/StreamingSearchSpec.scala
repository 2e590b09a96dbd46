package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.model.{IndexType, SeqMapping}

class StreamingSearchSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = SeqMapping.of(
    "level" -> IndexType.Keyword,
    "msg"   -> IndexType.Text,
    "size"  -> IndexType.Keyword)

  private val reqTime = 1704067200000L

  private def line(ts: String, level: String, msg: String, size: Int): String =
    s"""{"ts":"$ts","level":"$level","msg":"$msg","size":$size}"""

  test("follow emits only matching docs, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingSearch.follow(mem.toDF(), mapping,
      "level:error and size:[100, *]", requestTimeMs = Some(reqTime))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("follow_out").start()
    try {
      mem.addData(
        line("2024-01-01T00:00:01Z", "error", "disk failed", 200),
        line("2024-01-01T00:00:02Z", "info", "disk ok", 300),
        line("2024-01-01T00:00:03Z", "error", "net slow", 50))
      q.processAllAvailable()
      mem.addData(
        line("2024-01-01T00:00:04Z", "error", "cpu hot", 150))
      q.processAllAvailable()
      val got = spark.sql("SELECT msg FROM follow_out")
        .collect().map(_.getString(0)).toSet
      assert(got == Set("disk failed", "cpu hot"))
    } finally q.stop()
  }

  test("follow applies text match and fields pipe on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamingSearch.follow(mem.toDF(), mapping,
      "msg:disk | fields level", requestTimeMs = Some(reqTime))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("follow_pipe_out").start()
    try {
      mem.addData(
        line("2024-01-01T00:00:01Z", "error", "disk failed", 1),
        line("2024-01-01T00:00:02Z", "warn", "memory low", 2))
      q.processAllAvailable()
      val df = spark.sql("SELECT * FROM follow_pipe_out")
      // pipe keeps (mid, rid) + requested fields only
      assert(df.columns.toSeq == Seq("mid", "rid", "level"))
      assert(df.select("level").collect().map(_.getString(0)).toSeq == Seq("error"))
    } finally q.stop()
  }
}
