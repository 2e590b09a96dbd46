package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingSubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "this exact shared license block travels between documents"

  test("shared spans drop across and within batches; index grows with survivors") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ssd").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingSubstringDedup.start(docs, "doc_id", "text",
      indexPath = s"$dir/idx", outPath = s"$dir/out",
      checkpointPath = s"$dir/ckpt", k = 16, w = 4,
      auditPath = Some(s"$dir/audit"))
    try {
      // batch 1: 1 and 2 share the boilerplate span (in-batch pair);
      // 3 is distinct
      mem.addData(
        (1L, s"intro words $boiler and an ending"),
        (2L, s"other opening $boiler different close"),
        (3L, "completely unrelated content with no overlap at all"))
      q.processAllAvailable()
      // batch 2: 10 shares the span with batch-1 survivor 1; 11 is new
      mem.addData(
        (10L, s"fresh framing $boiler yet another tail"),
        (11L, "novel second batch text sharing nothing with anyone"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 11L))
      val audit = spark.read.parquet(s"$dir/audit")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(audit == Set((10L, 1L)))
      val indexed = spark.read.parquet(s"$dir/idx/wins")
        .select("id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 3L, 11L))
    } finally q.stop()
  }
}
