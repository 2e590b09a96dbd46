package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamingDedup._

  test("first occurrence wins across micro-batches; dupes audited") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedup(mem.toDS(), emitDupes = true)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    try {
      // batch 1: two distinct payloads, one in-batch duplicate
      mem.addData(Doc(100L, 3L, "a"), Doc(100L, 1L, "a"), Doc(200L, 2L, "b"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate and a new payload
      mem.addData(Doc(100L, 9L, "a"), Doc(300L, 4L, "c"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT hash, id, is_first FROM dedup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // in-batch: smallest id wins regardless of arrival order
      assert(rows == Set(
        (100L, 1L, true), (100L, 3L, false), (200L, 2L, true),
        (100L, 9L, false), (300L, 4L, true)))
    } finally q.stop()
  }

  test("emitDupes=false silently drops duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.dedup(mem.toDS(), emitDupes = false)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_drop_out").start()
    try {
      mem.addData(Doc(100L, 1L, "a"), Doc(100L, 2L, "a"), Doc(200L, 3L, "b"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dedup_drop_out").as[Long].collect().toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }
}
