package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage runtime breakdown of ivfTopK (the slowest
  * bench line in round 3) to locate where the per-call training cost
  * actually goes at a given SF.
  * Usage: runMain graft.tools.ProfileIvf [sfDir]
  */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $label"); r
    }

    val emb = graft.tables.TestTables.embeddings(spark, sfDir)
    time("count embeddings")(println("    rows: " + emb.count()))

    val v = col("embedding").cast("array<double>")
    val points = emb.select(col("vec_id").as("neighbor_id"), v.as("v")).persist()
    time("materialize points cache")(points.count())
    val seed = time("seed collect")(
      points.orderBy(col("neighbor_id").asc).limit(16)
        .select(col("neighbor_id").as("cell"), col("v").as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq)
    var cent = seed
    for (i <- 1 to 2) {
      val rows = time(s"lloyd step $i") {
        points.select(col("neighbor_id"), col("v"),
            graft.functions.VectorExpressions.nearestCells(col("v"), cent)
              .getItem(0).as("cell"))
          .select(col("cell"), posexplode(col("v")))
          .withColumn("xi", expr("CAST(floor(col * 1000000 + 0.5) AS BIGINT)"))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))
          .collect()
      }
      cent = rows.groupBy(_.getLong(0)).toSeq.map { case (cell, rs) =>
        (cell, rs.sortBy(_.getInt(1)).map(r =>
          r.getLong(2).toDouble / (r.getLong(3).toDouble * 1000000.0)).toSeq)
      }.sortBy(_._1)
    }
    points.unpersist()
    time("full ivfTopK (end to end, incl retrain)") {
      graft.dataprep.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10).count()
    }
    time("full ivfTopK again (warm)") {
      graft.dataprep.Similarity.ivfTopK(emb, "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10).count()
    }
    spark.stop()
  }
}
