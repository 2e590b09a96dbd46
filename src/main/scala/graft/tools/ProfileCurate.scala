package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall clock of the Curate pipeline at a given
  * SF, to see where the composed query's time goes (each stage timed
  * on top of the previous ones' work, mirroring the real plan shape).
  * Usage: runMain graft.tools.ProfileCurate [sfDir]
  */
object ProfileCurate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROFILE_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job wall clock: which jobs the composed pipeline actually runs
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, je.time - t0, d))
      }
    })
    import graft.dataprep._
    val cfg = Curate.Config(minQuality = 0.3, minOverlap = 60,
      rates = Map("web" -> 0.5), defaultRate = 1.0)
    val df = graft.tables.TestTables.documents(spark, sfDir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  ${(System.nanoTime() - t0) / 1e9}%8.3f  $name"); r
    }
    val idCol = "doc_id"; val textCol = "text"
    val benchPred = col("doc_id") % 20 === 0
    val gated = TextAnalysis.withLangId(
        TextAnalysis.withQualityScore(df, textCol), textCol)
      .where(col("quality_score") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.keepLangs: _*))
      .drop("n_tokens", "n_distinct", "n_punct", "n_digit", "n_stop",
        "text_len", "s_en", "s_de", "s_es", "s_fr", "s_zh")
    t("gated.count")(gated.count())
    val keepExact = gated
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactDeduped = gated.join(keepExact, Seq(idCol))
    val survivors = exactDeduped.persist()
    t("survivors materialize")(survivors.count())
    val pairs = Dedup.minhashLshPairs(survivors, idCol, textCol,
      cfg.numHashes, cfg.bands, cfg.thresholdNum, cfg.thresholdDen)
      .select("id_a", "id_b")
    t("pairs.count")(pairs.count())
    val nearDeduped = t("dropNearDuplicates (clusters fixpoint)")(
      Dedup.dropNearDuplicates(survivors, idCol, pairs))
    t("nearDeduped.count")(nearDeduped.count())
    val cleaned = Decontaminate.clean(nearDeduped, idCol, textCol,
      benchPred, cfg.minOverlap)
    t("cleaned.count")(cleaned.count())
    val mixed = Sampling.weightedMix(cleaned, idCol, "source", cfg.rates, cfg.defaultRate)
    val out = Sampling.split(mixed, idCol)
    t("split.count")(out.count())
    spark.catalog.clearCache()
    done.clear()
    t("full pipeline, caches cleared")(
      Curate.pipeline(df, idCol, textCol, "source", benchPred, cfg).count())
    spark.catalog.clearCache()
    t("full pipeline, second run (codegen warm)")(
      Curate.pipeline(df, idCol, textCol, "source", benchPred, cfg).count())
    import scala.jdk.CollectionConverters._
    val byJob = done.asScala.toSeq.sortBy(-_._2).take(20)
    byJob.foreach { case (id, ms, d) =>
      println(f"  job $id%4d ${ms / 1000.0}%7.3f s  ${d.take(100)}") }
    println(f"  jobs=${done.size} totalJobTime=${done.asScala.map(_._2).sum / 1000.0}%.3f s")
    spark.stop()
  }
}
