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

  /** The bench shingle set folded into a [[graft.functions.LongBloom]]
    * in one distributed pass (explode + OR-aggregating UDAF; partial
    * bitsets merge map-side, one bitset crosses the wire per task).
    */
  def benchBloom(df: DataFrame, idCol: String, textCol: String,
      benchPred: Column, numBits: Int, numHashes: Int): graft.functions.LongBloom = {
    import org.apache.spark.sql.expressions.Aggregator
    val agg = new Aggregator[java.lang.Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = new Array[Long](numBits / 64)
      override def reduce(b: Array[Long], h: java.lang.Long): Array[Long] = {
        if (h != null) graft.functions.LongBloom.set(b, numHashes, h)
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
      override def finish(r: Array[Long]): Array[Long] = r
      override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }
    val bloomUdaf = org.apache.spark.sql.functions.udaf(agg,
      org.apache.spark.sql.Encoders.LONG)
    val bits = df.where(coalesce(benchPred, lit(false)))
      .select(explode(graft.functions.TokenizeExpr.bigramHashes(
        TextPrep.tokens(col(textCol)))).as("h"))
      .agg(bloomUdaf(col("h")).as("bits"))
      .head().getSeq[Long](0).toArray
    new graft.functions.LongBloom(bits, numHashes)
  }

  /** Map-side contamination report against a prebuilt bloom: per doc,
    * the count of its distinct shingle hashes that probe positive —
    * an UPPER BOUND on the true overlap (bloom false positives only
    * inflate it, never hide a real shingle), so every doc [[report]]
    * flags is flagged here too; a handful of extra docs may be.
    *
    * This is the 100 TB decontamination shape: [[report]] broadcasts
    * the bench hash SET into a join (GBs as a hash relation at 10^8
    * shingles) and shuffles the matching (id, hash) pairs; this path
    * ships one bitset (~numBits/8 bytes, ~10 bits per bench shingle
    * for ~1% FP) inside the codegen'd expression and the corpus never
    * leaves its scan — no explode, no join, no shuffle, no agg.
    */
  def reportBloom(df: DataFrame, idCol: String, textCol: String,
      benchPred: Column, minOverlap: Int,
      bloom: graft.functions.LongBloom): DataFrame =
    df.where(!coalesce(benchPred, lit(false)))
      .select(col(idCol), graft.functions.BloomExpressions.bloomOverlapCount(
        graft.functions.TokenizeExpr.bigramHashes(TextPrep.tokens(col(textCol))),
        bloom).as("n_overlap_max"))
      .where(col("n_overlap_max") >= minOverlap)
      .orderBy(idCol)

  /** Bloom-cleaned corpus: one pass to fold the (small) bench side
    * into bits, one map-only pass over the corpus to drop probable
    * contaminations. Conservative: drops a superset of [[clean]]'s
    * drops, controlled by the FP rate (size numBits ≈ 10× the distinct
    * bench shingle count for ~1%).
    */
  def cleanBloom(df: DataFrame, idCol: String, textCol: String,
      benchPred: Column, minOverlap: Int,
      numBits: Int = 1 << 22, numHashes: Int = 5): DataFrame = {
    val bloom = benchBloom(df, idCol, textCol, benchPred, numBits, numHashes)
    df.where(!coalesce(benchPred, lit(false)))
      .where(graft.functions.BloomExpressions.bloomOverlapCount(
        graft.functions.TokenizeExpr.bigramHashes(TextPrep.tokens(col(textCol))),
        bloom) < minOverlap)
  }
}
