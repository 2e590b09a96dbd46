package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training-data pipelines: flag corpus
  * documents that share at least `minOverlap` word-n-gram shingles with
  * a benchmark/eval set, so they can be dropped before training.
  *
  * Scale shape: the benchmark side is tiny relative to the corpus (an
  * eval set is thousands of docs against a 100 TB corpus), so its
  * distinct shingle-hash set broadcasts; the corpus side is one
  * map-side explode + broadcast-hash semi-join + partial-aggregated
  * count per doc — no corpus-sized shuffle. Shingle hashes are the
  * sorted-distinct xxhash64 word bigrams of [[graft.functions.TokenizeExpr.bigramHashes]]
  * (same domain the dedup operators use), so per-doc explode emits no
  * duplicate hashes and `count(*)` equals the distinct-overlap count.
  */
object Decontaminate {

  /** Per-doc contamination report: corpus docs (NOT matching
    * `benchPred`) sharing >= `minOverlap` distinct shingles with the
    * bench docs (matching `benchPred`). Output: (idCol, n_overlap)
    * ordered by id.
    */
  def report(df: DataFrame, idCol: String, textCol: String,
      benchPred: Column, minOverlap: Int): DataFrame = {
    // NULL predicate rows are corpus docs, not bench docs — without the
    // coalesce they'd vanish from both sides (NOT NULL is NULL)
    val sh = df.select(col(idCol), coalesce(benchPred, lit(false)).as("is_bench"),
      graft.functions.TokenizeExpr.bigramHashes(TextPrep.tokens(col(textCol))).as("sh"))
    val benchSh = sh.where(col("is_bench"))
      .select(explode(col("sh")).as("h")).distinct()
    sh.where(!col("is_bench"))
      .select(col(idCol), explode(col("sh")).as("h"))
      .join(broadcast(benchSh), Seq("h"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
      .orderBy(idCol)
  }

  /** The cleaned corpus: drop contaminated docs (left-anti against the
    * report). */
  def clean(df: DataFrame, idCol: String, textCol: String,
      benchPred: Column, minOverlap: Int): DataFrame =
    df.where(!coalesce(benchPred, lit(false))).join(
      report(df, idCol, textCol, benchPred, minOverlap).select(idCol),
      Seq(idCol), "left_anti")
}
