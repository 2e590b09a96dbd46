package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-6 additions: document-frequency cap on containment candidate
  * generation (the stop-shingle hot-key guard).
  */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  // Corpus shape: every doc carries the same boilerplate phrase (its
  // bigrams hit 100% document frequency); real duplication evidence is
  // the rare per-pair payload.
  private def stopHeavy(nPairs: Int): org.apache.spark.sql.DataFrame = {
    val boiler = "terms of service apply to all"
    (0 until nPairs).flatMap { i =>
      Seq((2L * i, s"$boiler payload$i alpha$i beta$i gamma$i"),
        (2L * i + 1, s"$boiler payload$i alpha$i beta$i gamma$i extra$i"))
    }.toDF("doc_id", "text")
  }

  test("containmentPairs DF cap: rare-shingle evidence keeps the result identical") {
    val df = stopHeavy(12)
    val uncapped = pairs(Dedup.containmentPairs(df, "doc_id", "text", 8, 10))
    val capped = pairs(Dedup.containmentPairs(df, "doc_id", "text", 8, 10,
      maxDfFrac = 0.2))
    assert(capped == uncapped && uncapped.nonEmpty)
  }

  test("containmentPairs DF cap: pairs whose only evidence is stop-shingles are the documented recall loss") {
    // Two docs share ONLY the universal boilerplate (containment 1.0
    // for the shorter doc); the rest of the corpus gives the boilerplate
    // bigrams >cap document frequency.
    val boiler = "terms of service apply"
    val df = ((0L until 20L).map(i => (i, s"$boiler unique$i only$i content$i here$i"))
      :+ (100L, boiler) :+ (101L, s"$boiler tail1 tail2 tail3 tail4 tail5 tail6"))
      .toDF("doc_id", "text")
    val uncapped = pairs(Dedup.containmentPairs(df, "doc_id", "text", 9, 10))
    val capped = pairs(Dedup.containmentPairs(df, "doc_id", "text", 9, 10,
      maxDfFrac = 0.2))
    // uncapped sees 100→everything (doc 100 is pure boilerplate, wholly
    // contained in every other doc); under the cap those pairs' entire
    // evidence is hot shingles — the documented recall loss, and the
    // ONLY loss (pairs with any rare evidence are provably kept)
    assert(uncapped.contains((100L, 101L)) && uncapped.forall(_._1 == 100L))
    assert(capped.isEmpty)
  }

  test("containmentPairs absolute DF cap composes as the tighter bound") {
    val df = stopHeavy(12)
    val uncapped = pairs(Dedup.containmentPairs(df, "doc_id", "text", 8, 10))
    // abs cap looser than frac cap -> same exclusion set as frac alone
    val both = pairs(Dedup.containmentPairs(df, "doc_id", "text", 8, 10,
      maxDfFrac = 0.2, maxDfAbs = 1000L))
    assert(both == uncapped && uncapped.nonEmpty)
    // abs cap alone (no fractional cap) still activates hot filtering:
    // rare-evidence pairs identical to uncapped
    val absOnly = pairs(Dedup.containmentPairs(df, "doc_id", "text", 8, 10,
      maxDfFrac = 1.0, maxDfAbs = 3L))
    assert(absOnly == uncapped)
  }

  test("containmentPairs DF cap: hot filtering stays in-kernel, no extra join shapes") {
    val df = stopHeavy(40)
    // the public wrapper checkpoints its result (its plan is a block
    // scan); the join-shape contract lives on the lazy inner plan
    val s = Dedup.containmentHashes(df, "doc_id", "text").persist()
    val out = Dedup.containmentPairsFromHashes(s, 8, 10,
      maxDfFrac = 0.2, maxDfAbs = 0L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    s.unpersist()
    // the hot set rides inside the codegen'd sorted-diff kernel: no
    // anti-join stages, and certainly no cartesian/nested-loop shapes
    assert("(?i)sorteddiff".r.findFirstIn(plan).isDefined, plan.take(2000))
    assert("(?i)leftanti".r.findFirstIn(plan).isEmpty)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("embeddingNearDupPairs knownCount selects the branch without counting") {
    val vecs = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(d => ((i * 3 + d) % 7).toFloat / 7f)))
      .toDF("vec_id", "embedding")
    // a pipeline that already tracks its corpus size can force either
    // branch; the declared count wins over the actual row count
    val brute = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, knownCount = Some(40L))
    val lsh = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.9, knownCount = Some(1000000L))
    brute.collect(); lsh.collect()
    assert(brute.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(!lsh.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // both branches agree on the qualifying pairs (LSH recall ≈ 1 at
    // this threshold on identical/near-identical vectors)
    val bp = brute.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lp = lsh.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lp.subsetOf(bp) && lp.nonEmpty)
  }

  test("containmentPairs DF cap: bounded posting lists on a stop-word-heavy corpus") {
    // Mirror the internal capping arithmetic observably: with the cap,
    // no candidate-join key may originate from more docs than cap·N.
    val df = stopHeavy(40) // N = 80 docs; boilerplate bigrams have DF = 80
    val maxDfFrac = 0.2
    val s = df.select(col("doc_id"),
      graft.functions.TokenizeExpr.bigramHashes(TextPrep.tokens(col("text"))).as("hs"))
    val nDocs = s.count()
    val cap = math.max(1L, (maxDfFrac * nDocs).toLong)
    val surviving = s.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= cap)
    val maxSurvivingDf = surviving.agg(max(col("df"))).head().getLong(0)
    assert(maxSurvivingDf <= cap)
    // and the hot set really is tiny relative to the shingle vocabulary
    val hotCount = s.select(explode(col("hs")).as("h")).groupBy("h")
      .agg(count(lit(1)).as("df")).where(col("df") > cap).count()
    assert(hotCount >= 1L && hotCount < 20L)
  }
}
