package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines, built
  * on the same hash-priority idea as the quantile sketch
  * (graft.functions.SeqAggregates.mix64): every row's fate is a pure
  * function of its stable id, so any partitioning, any cluster size,
  * any merge order — even a different engine — reproduces the exact
  * same split/sample. No RNG state, no seed-per-partition pitfalls.
  */
object Sampling {

  val DefaultWeights: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** 63-bit non-negative hash of the uid (top bit shifted out so plain
    * signed comparisons work on both engines). Null uids hash as 0 so
    * rows with a missing id still land deterministically — and
    * identically on an oracle engine, where null ordering differs.
    *
    * `salt` decorrelates INDEPENDENT sampling decisions over the same
    * uids: composing two hash-range filters with the same salt keeps
    * exactly the rows below the smaller threshold (e.g. a 25% mix
    * feeding an 80/10/10 split would land everything in 'train').
    * Decisions that must cohere (nested samples at different rates)
    * share a salt; decisions that must be independent use distinct
    * ones. */
  def priority63(uid: Column, salt: Long = 0L): Column =
    shiftrightunsigned(
      graft.functions.VectorExpressions.mix64(
        coalesce(uid, lit(0L)).bitwiseXOR(lit(salt))), 1)

  /** Default salt for [[weightedMix]] ("mix_salt" in ASCII): distinct
    * from [[split]]'s 0, so mixing then splitting is independent out
    * of the box. */
  val WeightedMixSalt: Long = 0x6D69785F73616C74L

  /** Default salt for [[deterministicShuffle]] ("shuffle1" in ASCII):
    * its own hash stream, decorrelated from split and mix. Vary the
    * salt per epoch for a fresh-but-reproducible order each epoch. */
  val ShuffleSalt: Long = 0x73687566666C6531L

  /** Deterministic global shuffle: a reproducible total order over the
    * corpus (ORDER BY the salted hash priority of the uid, uid as the
    * collision tiebreak) — the "shuffle the dataset identically on
    * every run and engine" step before sharding a training export.
    * Unlike `orderBy(rand())` the order survives retries, re-runs and
    * engine changes, and unlike a stored permutation it needs no
    * state.
    *
    * Scale: one range-exchange sort on an incompressible key — the
    * one unavoidable full shuffle of an export pipeline; feed the
    * result straight to [[Packing.packShards]] keyed on `shuffle_key`.
    */
  def deterministicShuffle(df: DataFrame, uidCol: String,
      salt: Long = ShuffleSalt): DataFrame = {
    requireIntegralUid(df, uidCol)
    require(!df.columns.contains("shuffle_key"), "column 'shuffle_key' already exists")
    df.withColumn("shuffle_key", priority63(col(uidCol).cast("long"), salt))
      .orderBy(col("shuffle_key").asc, col(uidCol).asc)
  }

  /** The mix64 priority domain is the raw 64-bit integer value of the
    * uid; a non-integral uid (e.g. a string doc id) would cast to NULL
    * for every row, collapsing all priorities to mix64(0) — split()
    * would silently put the whole corpus in one bucket. Fail fast
    * instead: stable string ids must be pre-hashed to a BIGINT column
    * (e.g. xxhash64) by the caller, which keeps the priority function
    * an explicit, engine-portable contract.
    */
  private def requireIntegralUid(df: DataFrame, uidCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(uidCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"uid column '$uidCol' must be integral for deterministic " +
        s"hash-priority sampling, got $other; pre-hash string ids to " +
        "BIGINT (e.g. xxhash64) first")
    }
  }

  /** Integer thresholds on the 63-bit domain for cumulative weights —
    * computed in exact BigDecimal so the Spark side and a SQL oracle
    * embed identical literals.
    */
  def thresholds(weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "weights must sum to 1")
    require(weights.forall(_._2 > 0), "every weight must be positive")
    val scale = BigDecimal(2).pow(63)
    var cum = BigDecimal(0)
    weights.map { case (name, w) =>
      cum += BigDecimal(w)
      val t = (scale * cum).setScale(0, BigDecimal.RoundingMode.FLOOR)
      // the final cumulative bound is 2^63 itself — clamp into range;
      // the last split is the when-chain fallback, so its threshold is
      // never compared
      (name, if (t >= scale) Long.MaxValue else t.toLongExact)
    }
  }

  /** Assign each row to a named split (train/val/test by default) by
    * hash range — deterministic, engine-independent, stable under
    * re-partitioning and incremental reprocessing (a row's split never
    * changes when other rows come or go, unlike randomSplit).
    */
  def split(df: DataFrame, uidCol: String,
      weights: Seq[(String, Double)] = DefaultWeights,
      asCol: String = "split"): DataFrame = {
    require(!df.columns.contains(asCol), s"column '$asCol' already exists")
    requireIntegralUid(df, uidCol)
    val h = priority63(col(uidCol).cast("long"))
    val ts = thresholds(weights)
    val expr = ts.init.foldRight(lit(ts.last._1): Column) { case ((name, t), acc) =>
      when(h < lit(t), lit(name)).otherwise(acc)
    }
    // foldRight builds when-chains nested in the otherwise branch; the
    // last split is the unconditional fallback
    df.withColumn(asCol, expr)
  }

  /** Threshold on the 63-bit priority domain for a keep-rate in
    * [0, 1] — exact BigDecimal, same contract as [[thresholds]].
    * Returns None for rate >= 1 (keep everything: 2^63 itself is not
    * representable as a signed threshold).
    */
  def rateThreshold(rate: Double): Option[Long] = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val scale = BigDecimal(2).pow(63)
    val t = (scale * BigDecimal(rate)).setScale(0, BigDecimal.RoundingMode.FLOOR)
    if (t >= scale) None else Some(t.toLongExact)
  }

  /** Domain mixing: deterministic per-group downsampling. Keeps each
    * row iff its hash priority falls below its group's rate threshold
    * — so "sample web at 10%, books at 100%, code at 50%" is one
    * narrow map-side filter (no shuffle, no count pass, no RNG), a
    * row's fate never changes as the corpus grows, and a row kept at
    * rate r stays kept at any rate >= r (nested samples — raising a
    * domain's weight only ADDS documents, it never churns the ones
    * already selected, which keeps training-data diffs reviewable).
    */
  def weightedMix(df: DataFrame, uidCol: String, groupCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: Long = WeightedMixSalt): DataFrame = {
    requireIntegralUid(df, uidCol)
    val h = priority63(col(uidCol).cast("long"), salt)
    def keep(rate: Double): Column =
      rateThreshold(rate).map(t => h < lit(t)).getOrElse(lit(true))
    val cond = rates.toSeq.sortBy(_._1).foldRight(keep(defaultRate)) {
      case ((g, r), acc) => when(col(groupCol) === lit(g), keep(r)).otherwise(acc)
    }
    df.where(cond)
  }

  /** Default salt for [[temperatureMix]] ("temp_mix" in ASCII): its
    * own hash stream, independent of split/mix/shuffle decisions. */
  val TemperatureMixSalt: Long = 0x74656D705F6D6978L

  /** Temperature-balanced domain mixing: deterministic downsampling
    * that reshapes the group-size distribution toward
    * p_g ∝ c_g^alpha (alpha = 1 keeps the natural distribution,
    * alpha → 0 approaches uniform) — the standard rebalancing applied
    * to multilingual / multi-domain training corpora so rare domains
    * are not drowned out. With keep rate r_g = (c_min/c_g)^(1-alpha)
    * the smallest group is kept whole and every sampled group lands at
    * expected size c_min^(1-alpha) · c_g^alpha — no upsampling, no
    * duplication, and (like every sampler here) a row's fate is a pure
    * function of (uid, salt, its group's keep rate).
    *
    * The keep decision compares the row's 63-bit priority, scaled to
    * [0,1) in double, against the group rate. For alpha = 0.5 the rate
    * is computed with sqrt (IEEE-exact, correctly rounded everywhere)
    * so an oracle on any engine reproduces the sample bit for bit;
    * other alphas go through pow, whose last-ulp rounding is libm-
    * specific — fine in production, not contractual across engines.
    * Rows of the minimal group short-circuit on the exact integer
    * count comparison, not the float rate, so "keep the smallest group
    * whole" is exact.
    *
    * Scale: one map-side-combined count aggregation over the corpus
    * (#groups rows out), rate arithmetic on that tiny frame, then a
    * broadcast join back and a narrow filter — the corpus itself is
    * never shuffled.
    */
  def temperatureMix(df: DataFrame, uidCol: String, groupCol: String,
      alpha: Double = 0.5, salt: Long = TemperatureMixSalt): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    requireIntegralUid(df, uidCol)
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    val cmin = counts.agg(min(col("__cnt")).as("__cmin"))
    val ratio = col("__cmin").cast("double") / col("__cnt").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    val rates = counts.crossJoin(broadcast(cmin)).withColumn("__rate", rate)
    val hd = priority63(col(uidCol).cast("long"), salt).cast("double") /
      lit(9.223372036854775808e18)
    df.join(broadcast(rates), groupCol)
      .where(col("__cnt") === col("__cmin") || hd < col("__rate"))
      .drop("__cnt", "__cmin", "__rate")
  }

  val LeakageSplitSalt: Long = 0x6C65616B5F73706CL

  /** Leakage-safe train/val/test split: the hash-range assignment of
    * [[split]], but keyed by each row's NEAR-DUP CLUSTER representative
    * (from [[Dedup.clusters]] over the given candidate `pairs`) instead
    * of its own id — so a document and its near-duplicates can never
    * straddle the train/test boundary. Plain hash splits leak: a test
    * document whose near-copy sits in train inflates every downstream
    * eval. Keying by the cluster representative moves the whole
    * connected component together; singletons (the overwhelming
    * majority) key by themselves, preserving [[split]]'s marginal
    * proportions.
    *
    * The salt decorrelates this split from a plain [[split]] over the
    * same ids (see [[priority63]]'s salt contract).
    *
    * Scale: clusters is the persisted min-label fixpoint (or one
    * driver union-find below its edge cap — near-dup graphs are sparse
    * by construction); the rep join is an equi-join on the id, AQE
    * handles the build side; the split itself is row-local. Returns
    * `df` plus `rep` (the cluster representative) and `asCol`.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: Seq[(String, Double)] = DefaultWeights,
      salt: Long = LeakageSplitSalt, asCol: String = "split"): DataFrame = {
    require(!df.columns.contains("rep"), "column 'rep' already exists")
    requireIntegralUid(df, idCol)
    val reps = Dedup.clusters(df.select(col(idCol).as("id")), "id", pairs)
    val withRep = df.join(reps.withColumnRenamed("id", idCol), Seq(idCol))
      .withColumn("__rep_uid", col("rep").cast("long").bitwiseXOR(lit(salt)))
    split(withRep, "__rep_uid", weights, asCol).drop("__rep_uid")
  }

  /** Exactly-k-per-group deterministic sample: the k rows with the
    * smallest hash priorities in each group (ties broken by uid). A
    * uniform without-replacement sample per group — and, like
    * [[split]], reproducible anywhere.
    */
  def stratifiedSample(df: DataFrame, groupCol: String, uidCol: String, k: Int): DataFrame = {
    require(!df.columns.contains("sample_rank"), "column 'sample_rank' already exists")
    requireIntegralUid(df, uidCol)
    val h = priority63(col(uidCol).cast("long"))
    // null-safe tiebreak: engines disagree on null ordering
    val w = Window.partitionBy(col(groupCol))
      .orderBy(h.asc, coalesce(col(uidCol).cast("long"), lit(0L)).asc)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }
}
