package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage breakdown of the bulk-ingest write path at
  * bench shape (1M NDJSON events → day-partitioned sorted zstd parquet).
  * Usage: runMain graft.tools.ProfileIngest [sfDir]
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ingest.BulkIngest
    import graft.model.{IndexType, SeqMapping}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $label"); r
    }

    val src = spark.read.parquet(s"$sfDir/events.parquet")
    val base = src.select(to_json(struct(
        date_format(timestamp_millis(graft.tables.TestTables.tsMid(src)),
          "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("timestamp"),
        col("event_type"),
        col("user_id").cast("string").as("user_id"),
        col("value").cast("string").as("value"),
        col("props"))).as("value"))
      .persist()
    println("lines: " + base.count())
    val lines = (1 to 10).map(_ => base).reduce(_ union _)
    val mapping = SeqMapping.of(
      "event_type" -> IndexType.Keyword,
      "user_id"    -> IndexType.Keyword,
      "value"      -> IndexType.Keyword,
      "props"      -> IndexType.Text)
    val reqT = 1706745599999L
    val drift = 10L * 365 * 86400 * 1000

    // warm codegen paths once
    time("warm full ingest (cold)")(BulkIngest.ingestPartitioned(
      lines, mapping, reqT, "/tmp/prof_ingest", allowedDriftMs = drift))

    time("stamp only")(
      BulkIngest.stamp(lines, reqT, allowedDriftMs = drift)
        .write.mode("overwrite").format("noop").save())
    val staged = BulkIngest.stamp(lines, reqT, allowedDriftMs = drift)
      .withColumn("date", to_date(timestamp_millis(col("mid"))))
    time("stamp + range exchange + sort")(
      staged.repartitionByRange(col("date"), col("mid"))
        .sortWithinPartitions(col("date"), col("mid"), col("rid"))
        .write.mode("overwrite").format("noop").save())
    time("stamp + expand, no exchange")(
      BulkIngest.expand(staged, mapping, extraCols = Seq("date"))
        .write.mode("overwrite").format("noop").save())
    time("full ingest warm")(BulkIngest.ingestPartitioned(
      lines, mapping, reqT, "/tmp/prof_ingest", allowedDriftMs = drift))
    time("full ingest warm 2")(BulkIngest.ingestPartitioned(
      lines, mapping, reqT, "/tmp/prof_ingest", allowedDriftMs = drift))
    spark.stop()
  }
}
