package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingSpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  private val span1 = "this exact shared license block travels between documents"
  private val span2 = "another duplicated passage repeated inside one batch!!"

  test("spans keep one surviving occurrence across the whole stream history") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ssr").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingSpanRemoval.start(docs, "doc_id", "text",
      indexPath = s"$dir/idx", outPath = s"$dir/out",
      checkpointPath = s"$dir/ckpt", k = 16)
    try {
      // batch 1: no index yet, no internal duplication — unchanged
      mem.addData((1L, s"intro words $span1 and an ending"))
      q.processAllAvailable()
      // batch 2: 10 repeats span1 (published in batch 1 -> excised);
      // 11 and 12 share span2 in-batch (11 keeps, 12 loses)
      mem.addData(
        (10L, s"fresh framing $span1 yet another tail"),
        (11L, s"first carrier $span2 closing words"),
        (12L, s"second carrier $span2 different close"))
      q.processAllAvailable()
      // batch 3: span2 now indexed from its batch-2 survivor -> excised
      mem.addData((20L, s"third carrier $span2 late arrival"))
      q.processAllAvailable()

      val out = spark.read.parquet(s"$dir/out")
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(out(1L) == ((0L, s"intro words $span1 and an ending")))
      assert(!out(10L)._2.contains("license") && out(10L)._1 > 0)
      assert(out(11L) == ((0L, s"first carrier $span2 closing words")))
      assert(!out(12L)._2.contains("duplicated") && out(12L)._1 > 0)
      assert(!out(20L)._2.contains("duplicated") && out(20L)._1 > 0)
      // the untouched fringes survive every rewrite
      // (the shared region extends into the bounding spaces, which
      // are excised with it — fringe words survive, separators go)
      assert(out(10L)._2.startsWith("fresh framing") && out(10L)._2.endsWith("tail"))
      assert(out(20L)._2.startsWith("third") && out(20L)._2.endsWith("late arrival"))

      // the index accretes PUBLISHED text: batch partitions exist and
      // probing a repeat of published fringe text excises it
      val idxBatches = new java.io.File(s"$dir/idx/allwins").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(idxBatches == Set("batch=0", "batch=1", "batch=2"))
      val probe = graft.dataprep.Dedup.removeSpansAgainstIndex(
        Seq((99L, s"echo: intro words $span1 and an ending")).toDF("doc_id", "text"),
        "doc_id", "text", k = 16, s"$dir/idx")
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(probe(99L) == "echo: ")
    } finally q.stop()
  }
}
