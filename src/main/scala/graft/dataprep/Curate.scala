package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs, expressed as ONE DataFrame program so
  * Catalyst sees (and optimizes) the whole flow — no materialization
  * barriers between stages unless a stage semantically needs one.
  *
  * Stage order follows standard practice (cheap row-local gates first,
  * corpus-wide joins on the survivors only):
  *   1. quality gate      — row-local, runs at scan time
  *   2. language gate     — row-local
  *   3. exact dedup       — one hash-groupBy on the gated corpus
  *   4. near-dup drop     — MinHash+LSH clusters, keep representatives
  *   5. decontamination   — n-gram overlap vs the benchmark subset
  *   6. domain mixing     — row-local hash-rate filter
  *   7. train/val/test    — row-local hash-range split
  * Every stage is individually oracle-verified by its own gate query;
  * this operator is the composition, invariant-checked in CurateSpec.
  */
object Curate {

  /** Pipeline configuration. `minQuality` gates on
    * [[TextAnalysis.qualityScore]]'s composite score; `keepLangs` on
    * [[TextAnalysis.langId]]'s prediction; near-dup uses
    * [[Dedup.minhashLshPairs]] at jaccard >= thresholdNum/thresholdDen;
    * `benchPred` marks benchmark rows for [[Decontaminate.clean]];
    * `rates`/`defaultRate` feed [[Sampling.weightedMix]].
    */
  final case class Config(
      minQuality: Double = 0.35,
      keepLangs: Seq[String] = Seq("en", "de", "es", "fr"),
      numHashes: Int = 128,
      bands: Int = 32,
      thresholdNum: Int = 1,
      thresholdDen: Int = 2,
      minOverlap: Int = 5,
      rates: Map[String, Double] = Map.empty,
      defaultRate: Double = 1.0)

  /** Run the pipeline. Returns the curated corpus: original columns
    * plus `quality_score`, `pred_lang` and `split` provenance.
    */
  def pipeline(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, benchPred: Column, cfg: Config = Config()): DataFrame = {
    // 1-2: row-local gates appended IN PLACE (withQualityScore /
    // withLangId) — score, predict and filter fuse into one pass over
    // the scan; the join-per-gate formulation would re-scan the corpus
    // three times and shuffle it twice for columns that are pure
    // functions of the row
    val gated = TextAnalysis.withLangId(
        TextAnalysis.withQualityScore(df, textCol), textCol)
      .where(col("quality_score") >= cfg.minQuality &&
        col("pred_lang").isin(cfg.keepLangs: _*))
      .drop("n_tokens", "n_distinct", "n_punct", "n_digit", "n_stop",
        "text_len", "s_en", "s_de", "s_es", "s_fr", "s_zh")

    // 3: exact dedup — keep the min-id representative per content hash
    val keepExact = gated
      .groupBy(md5(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val exactDeduped = gated.join(keepExact, Seq(idCol))

    // 4: near-dup drop on the exact-deduped survivors. The pairs plan
    // feeds the clusters fixpoint, which persists its own edge list —
    // persist the survivor set once here so the fixpoint's repeated
    // reads don't re-run stages 1-3 per round.
    val survivors = exactDeduped.persist()
    val pairs = Dedup.minhashLshPairs(survivors, idCol, textCol,
      cfg.numHashes, cfg.bands, cfg.thresholdNum, cfg.thresholdDen)
      .select("id_a", "id_b")
    // decontamination reads its input THREE times (bench shingles,
    // corpus shingles, the outer anti-join base) and the final split
    // once more — persist the near-deduped survivors so each traversal
    // is a cache read, not a survivors⋈labels join replay. Eager
    // materialization is consistent with this stage's shape: the
    // clusters fixpoint already runs jobs at call time. With it
    // materialized, both upstream caches (stage-3 survivors AND the
    // fixpoint's converged label frame — which dropNearDuplicates
    // would leave pinned) can go.
    val labels = Dedup.clusters(survivors, idCol, pairs)
    val nearDeduped = survivors.join(
      labels.where(col("id") === col("rep")).select(col("id").as(idCol)),
      Seq(idCol)).persist()
    nearDeduped.count()
    labels.unpersist()
    survivors.unpersist()

    // 5: decontamination vs the benchmark subset
    val cleaned = Decontaminate.clean(nearDeduped, idCol, textCol,
      benchPred, cfg.minOverlap)

    // 6-7: row-local mixing + split
    val mixed =
      if (cfg.rates.isEmpty && cfg.defaultRate >= 1.0) cleaned
      else Sampling.weightedMix(cleaned, idCol, sourceCol, cfg.rates, cfg.defaultRate)
    Sampling.split(mixed, idCol)
  }

  /** Per-stage audit counts (docs surviving each gate) — the report a
    * pipeline run logs for dataset cards. One job per stage boundary.
    */
  def report(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, benchPred: Column, cfg: Config = Config()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = pipeline(df, idCol, textCol, sourceCol, benchPred, cfg).persist()
    val total = df.count()
    val kept = out.count()
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.unpersist()
    (Seq("input" -> total, "kept" -> kept) ++ bySplit.toSeq.sortBy(_._1))
      .toDF("stage", "docs")
  }
}
