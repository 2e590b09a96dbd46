package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev diagnostic: for every gate row, time `count()` (Bench's
  * consumer) vs `queryExecution.toRdd.count()` (executes the row's
  * full plan, all columns). A large ratio means column pruning + join
  * elimination removed the operator's actual work from the benched
  * plan — the row's bench number measures a no-op.
  * Usage: runMain graft.tools.DiagnoseConsume [sfDir]
  */
object DiagnoseConsume {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set("dp_stream_dedup", "dp_stream_neardedup", "dp_stream_sessionize",
      "seq_stream_livecount", "dp_stream_spanremove", "seq_stream_follow")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!skip(name)) {
        try {
          spark.catalog.clearCache()
          var t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val tc = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          t0 = System.nanoTime()
          fn(spark, sfDir).queryExecution.toRdd.count()
          val tr = (System.nanoTime() - t0) / 1e9
          println(f"$name%-36s count=$tc%7.3f plan=$tr%7.3f ratio=${tr / math.max(tc, 0.001)}%6.2f")
        } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      }
    }
    spark.stop(); sys.exit(0)
  }
}
