package graft.dataprep

import graft.SparkSpec
import graft.tables.TestTables

class SimilarityIndexSpec extends SparkSpec {

  test("persisted IVF index reproduces the retrain-per-call results exactly") {
    val df = TestTables.embeddings(spark, sfDir)
    val direct = Similarity.ivfTopK(df, "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L), k = 5).collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.buildIvfIndex(df, "vec_id", "embedding", path)
    val indexed = Similarity.ivfTopKIndexed(spark, path, Seq(0L, 1L, 2L), k = 5)
      .collect().toSeq
    assert(indexed == direct)
    // the index layout is one directory per cell — the physical basis
    // for probed-cells-only reads
    val cells = new java.io.File(s"$path/points").list().count(_.startsWith("cell="))
    assert(cells > 1)
    // partition pruning engages: a one-cell filter's scan opens fewer
    // files than the index holds (numFiles is the post-prune metric;
    // df.inputFiles would report the pre-prune listing)
    val allFiles = spark.read.parquet(s"$path/points").inputFiles.length
    val q = spark.read.parquet(s"$path/points")
      .where(org.apache.spark.sql.functions.col("cell") === 0)
    q.count()
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metrics("numFiles").value < allFiles)
  }
}
