package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import graft.dataprep.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSessionize._

  test("batch sessionize: gaps split sessions, counts and bounds correct") {
    val df = Seq(
      (1L, 1000L, 1L), (1L, 2000L, 2L), (1L, 3000L, 3L),   // session 1
      (1L, 10000L, 4L), (1L, 10500L, 5L),                   // session 2 (gap 7s > 5s)
      (2L, 1000L, 6L),                                      // user 2, one session
    ).toDF("user_id", "mid", "rid")
    val out = Sessionize.sessions(df, "user_id", "mid", "rid", gapMs = 5000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 1000L, 3000L),
      (1L, 2L, 2L, 10000L, 10500L),
      (2L, 1L, 1L, 1000L, 1000L),
    ))
  }

  test("streaming sessionize emits closed sessions via custom state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StreamingSessionize.sessions(mem.toDS(), gapMs = 5000L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions_out").start()
    try {
      mem.addData(Event(1, 1000), Event(1, 2000), Event(2, 500))
      q.processAllAvailable()
      // nothing closed yet (sessions still open)
      assert(spark.sql("SELECT * FROM sessions_out").count() == 0)
      // an event far past the gap closes user 1's first session
      mem.addData(Event(1, 20000))
      q.processAllAvailable()
      val rows = spark.sql("SELECT user, start_ms, end_ms, n_events FROM sessions_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq((1L, 1000L, 2000L, 2L)))
    } finally q.stop()
  }
}
