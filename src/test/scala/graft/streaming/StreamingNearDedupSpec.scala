package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingNearDedupSpec extends SparkSpec {
  import spark.implicits._

  test("near-dups drop across and within batches; index grows with survivors") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_snd").toString
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingNearDedup.start(docs, "doc_id", "text",
      indexPath = s"$dir/idx", outPath = s"$dir/out",
      checkpointPath = s"$dir/ckpt", auditPath = Some(s"$dir/audit"))
    try {
      // batch 1: 1 and 2 are near-dups of each other (in-batch), 3 distinct
      mem.addData(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon eta"),
        (3L, "one two three four five six"))
      q.processAllAvailable()
      // batch 2: 10 dups batch-1 survivor 1; 11 is new
      mem.addData(
        (10L, "alpha beta gamma delta epsilon zeta"),
        (11L, "red green blue cyan magenta yellow"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 11L))
      // audit names the corpus doc each drop matched
      val audit = spark.read.parquet(s"$dir/audit")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(audit == Set((10L, 1L)))
      // the index holds exactly the survivors
      val indexed = spark.read.parquet(s"$dir/idx/shingles")
        .select("id").distinct().collect().map(_.getLong(0)).toSet
      assert(indexed == Set(1L, 3L, 11L))
    } finally q.stop()
  }
}
