package graft
import org.apache.spark.sql.functions._
object TmpDumpLabels {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = tables.TestTables.documents(spark, "/tmp/graft_sf1")
    val pairs = dataprep.Dedup.minhashLshPairs(d,
      "doc_id", "text", numHashes = 128, bands = 32, thresholdNum = 1, thresholdDen = 2)
      .select("id_a", "id_b")
    pairs.coalesce(1).write.mode("overwrite").parquet("/tmp/sf1_engine_pairs")
    dataprep.Dedup.clusters(d, "doc_id", pairs.select("id_a", "id_b"))
      .coalesce(1).write.mode("overwrite").parquet("/tmp/sf1_engine_labels")
    spark.stop()
  }
}
