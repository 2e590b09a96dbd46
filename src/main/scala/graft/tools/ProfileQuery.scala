package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries by name (cold then
  * warm) under the same session config as Bench, without paying for a
  * full bench sweep.
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <query> [query...]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: ProfileQuery <sfDir> <query> [query...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'"))
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $n run$run rows=$cnt")
      }
    }
    spark.stop()
  }
}
