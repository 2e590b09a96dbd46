package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage bisect of ngramFreq — where do the ~3s go?
  * Usage: runMain graft.tools.ProfileNgram [sfDir]
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $label"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = graft.dataprep.TextPrep.tokens(col("text"))
    (1 to 2).foreach { _ =>
      time("scan only")(docs.select(col("text")).count())
      time("tokens size sum")(
        docs.select(size(toks).as("n")).agg(sum("n")).collect())
      val grams = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
      time("grams size sum")(
        docs.select(size(grams).as("n")).agg(sum("n")).collect())
      time("explode count")(docs.select(explode(grams).as("g")).count())
      time("explode groupBy topk")(
        docs.select(explode(grams).as("ngram"))
          .groupBy("ngram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ngram").asc).limit(50).collect())
      time("full ngramFreq")(
        graft.dataprep.CorpusStats.ngramFreq(docs, "text", 2, 50).collect())
    }
    spark.stop()
  }
}
