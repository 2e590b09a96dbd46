package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage runtime breakdown of the dedup pipelines
  * (candidate counts + wall-clock per stage) to locate where the
  * near-dup queries spend their time at a given SF.
  * Usage: runMain graft.tools.ProfileDedup [sfDir]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val aqe = args.drop(1).headOption.getOrElse("true")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dataprep.{Dedup, TextPrep}

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $label"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs: ${docs.count()}")

    // ---- minhash lsh breakdown ----
    val withSh = docs.select(col("doc_id").as("id"),
      graft.functions.TokenizeExpr.bigramHashes(TextPrep.tokens(col("text"))).as("sh"))
      .persist()
    time("materialize shingles")(withSh.count())
    println("  avg shingles/doc: " + withSh.select(avg(size(col("sh")))).collect()(0).getDouble(0))
    val banded = withSh.select(col("id"),
      explode(graft.functions.VectorExpressions.minhashBandKeys(col("sh"), 128, 32)).as("bk"))
    time("banded rows")(println("  n=" + banded.count()))
    val pairs = banded.select(col("id").as("id_a"), col("bk"))
      .join(banded.select(col("id").as("id_b"), col("bk")), Seq("bk"))
      .where(col("id_a") < col("id_b"))
    time("raw candidates")(println("  n=" + pairs.count()))
    val dd = pairs.select("id_a", "id_b").dropDuplicates("id_a", "id_b").persist()
    time("deduped candidates")(println("  n=" + dd.count()))
    val verified = dd
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("inter_cnt",
        graft.functions.VectorExpressions.sortedIntersectCount(col("sh_a"), col("sh_b")))
      .where(col("inter_cnt") * 2 >= size(col("sh_a")) + size(col("sh_b")) - col("inter_cnt"))
    time("verify join")(println("  n=" + verified.count()))
    time("full minhashLshPairs")(
      println("  n=" + Dedup.minhashLshPairs(docs, "doc_id", "text", 128, 32, 1, 2).count()))

    // ---- simhash breakdown ----
    val s = docs.select(col("doc_id").as("id"),
      Dedup.simhash64(TextPrep.tokens(col("text"))).as("sim"))
    time("simhash values")(println("  n=" + s.count()))
    val sbanded = s.withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("key", shiftleft(col("band").cast("long"), 16).bitwiseOR(
        call_function("shiftright", col("sim"), col("band") * 16).bitwiseAND(lit(0xFFFFL))))
      .persist()
    time("simhash banded")(println("  n=" + sbanded.count()))
    val scand = sbanded.select(col("id").as("id_a"), col("sim").as("sim_a"), col("key"))
      .join(broadcast(sbanded.select(col("id").as("id_b"), col("sim").as("sim_b"), col("key"))), Seq("key"))
      .where(col("id_a") < col("id_b"))
    time("simhash candidates")(println("  n=" + scand.count()))
    time("full simhashPairs")(
      println("  n=" + Dedup.simhashPairs(docs, "doc_id", "text", 3).count()))

    // ---- ngram breakdown ----
    time("full ngramJaccardPairs")(
      println("  n=" + Dedup.ngramJaccardPairs(docs, "doc_id", "text", "n_chars", 25, 3, 10).count()))

    spark.stop()
  }
}
