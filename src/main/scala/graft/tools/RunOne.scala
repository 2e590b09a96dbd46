package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query by name against an sf dir with the full
  * bench consumer and let any failure propagate with its complete
  * stack — the debugging companion to Bench's truncated `errors`
  * entries (a task failure's root cause lives several `getCause`
  * levels down, past any one-line summary).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunOne <queryName> <sfDir> [k=v ...]")
    val (name, sfDir) = (args(0), args(1))
    val confs = args.drop(2).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.toRdd.count()
    println(f"$name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
    sys.exit(0)
  }
}
