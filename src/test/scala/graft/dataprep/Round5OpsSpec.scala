package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-5 additions: passage-level dedup (fixed-window substring
  * dedup), temperature-balanced domain mixing, token-budget quality
  * selection, hybrid RRF retrieval.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- passageDedup ----

  private def passageRows(out: org.apache.spark.sql.DataFrame) =
    out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("passageDedup: later occurrences of a passage are dropped, doc order kept") {
    val df = Seq(
      (1L, "a b c d"), // passages: "a b", "c d" — both first
      (2L, "a b x y"), // "a b" repeats doc 1 → dropped; "x y" kept
      (3L, "c d")      // whole doc is a repeat → emptied
    ).toDF("doc_id", "text")
    val out = passageRows(Dedup.passageDedup(df, "doc_id", "text", passageTokens = 2))
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 1L, 0L, "")))
  }

  test("passageDedup: within-doc repetition dedupes against itself") {
    val df = Seq((7L, "a b a b a b")).toDF("doc_id", "text")
    val out = passageRows(Dedup.passageDedup(df, "doc_id", "text", passageTokens = 2))
    assert(out.toSeq == Seq((7L, 3L, 1L, "a b")))
  }

  test("passageDedup: short tail window is its own passage; empty docs drop out") {
    val df = Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text")
    val out = passageRows(Dedup.passageDedup(df, "doc_id", "text", passageTokens = 2))
    // "a b" and the 1-token tail "c" are distinct passages
    assert(out.toSeq == Seq((1L, 2L, 2L, "a b c")))
  }

  // ---- containmentPairs ----

  test("containmentPairs: catches inclusion that Jaccard misses, in one direction") {
    // doc 1 is wholly quoted inside doc 2 (plus a long tail), so
    // containment(1→2) = 1.0 while jaccard is far below 1/2
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12"),
      (3L, "totally unrelated content words")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", 9, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 3L))) // 3 of A's 3 bigrams in B; not 2→1
  }

  test("containmentPairs: matches brute force on a random-ish corpus") {
    val words = Array("a", "b", "c", "d", "e", "f")
    def text(i: Long): String =
      (0 until (i % 7 + 2).toInt).map(j => words(((i * 31 + j * 17) % 6).toInt)).mkString(" ")
    val df = (0L until 60L).map(i => (i, text(i))).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // driver brute force over distinct-bigram STRING sets
    def shingles(s: String): Set[String] =
      s.split(" ").sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet
    val sh = (0L until 60L).map(i => i -> shingles(text(i))).filter(_._2.nonEmpty)
    val exp = (for {
      (ia, sa) <- sh; (ib, sb) <- sh
      if ia != ib && (sa & sb).size * 10 >= 8 * sa.size
    } yield (ia, ib)).toSet
    assert(got == exp)
  }

  // ---- unigramLogProb ----

  test("unigramLogProb: matches a driver replica of the smoothed-LM formula") {
    val texts = Seq((1L, "a a b"), (2L, "b c"), (3L, "a"), (4L, ""))
    val df = texts.toDF("doc_id", "text")
    val got = CorpusStats.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // corpus: a×3, b×2, c×1 → N=6, V=3, denom=9
    def nllE6(freq: Long): Long =
      math.floor((math.log(9d) - math.log(freq + 1d)) * 1e6 + 0.5).toLong
    val (na, nb, nc) = (nllE6(3), nllE6(2), nllE6(1))
    assert(got == Seq(
      (1L, 3L, 2 * na + nb),
      (2L, 2L, nb + nc),
      (3L, 1L, na))) // doc 4 has no tokens → no row
  }

  test("unigramLogProb: rarer tokens carry strictly higher surprisal") {
    val df = Seq((1L, "common common common common rare")).toDF("doc_id", "text")
    val out = CorpusStats.unigramLogProb(df, "doc_id", "text").collect()(0)
    // mean over {4×nll(common), 1×nll(rare)}; nll(rare) > nll(common)
    assert(out.getLong(1) == 5L)
    val meanE6 = out.getDouble(3)
    def nllE6(freq: Long): Long =
      math.floor((math.log(7d) - math.log(freq + 1d)) * 1e6 + 0.5).toLong
    assert(out.getLong(2) == 4 * nllE6(4) + nllE6(1))
    assert(meanE6 == out.getLong(2).toDouble / 5d)
  }

  // ---- naiveBayesScore ----

  test("naiveBayesScore: matches a driver replica; target-class tokens score positive") {
    val df = Seq(
      (1L, "good fine", "wiki"),
      (2L, "good good", "wiki"),
      (3L, "spam spam good", "web")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.naiveBayesScore(df, "doc_id", "text", "source", "wiki")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // pos tokens: good×3, fine×1 (N=4); neg: spam×2, good×1 (N=3); V=3
    def lo(cp: Long, cn: Long): Long =
      math.floor(((math.log(cp + 1d) - math.log(7d))
                - (math.log(cn + 1d) - math.log(6d))) * 1e6 + 0.5).toLong
    val (good, fine, spam) = (lo(3, 1), lo(1, 0), lo(0, 2))
    assert(got == Seq(
      (1L, 2L, good + fine),
      (2L, 2L, 2 * good),
      (3L, 3L, 2 * spam + good)))
    assert(fine > 0 && spam < 0, "class-exclusive tokens must have signed log-odds")
  }

  // ---- leakageSafeSplit ----

  test("leakageSafeSplit: a near-dup cluster never straddles the boundary") {
    // docs 1,2 near-identical (paired); 3 unrelated singleton
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different content about spark window functions")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(df, "doc_id", pairs)
      .select("doc_id", "rep", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sortBy(_._1)
    assert(out.map(_._2) == Seq(1L, 1L, 3L)) // reps: min-label; singleton = self
    assert(out(0)._3 == out(1)._3, "clustered docs must share a split")
    // and the assignment is exactly split() on the salted rep uid
    val exp = Sampling.split(
      out.map(t => Tuple1(t._2 ^ Sampling.LeakageSplitSalt)).toDF("u"), "u")
      .collect().map(_.getString(1))
    assert(out.map(_._3) == exp.toSeq)
  }

  test("leakageSafeSplit: no pairs degrades to a per-id split (decorrelated salt)") {
    val df = (0L until 200L).map(i => (i, s"doc number $i words")).toDF("doc_id", "text")
    val pairs = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    val out = Sampling.leakageSafeSplit(df, "doc_id", pairs)
    val byRep = out.select("doc_id", "rep").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(byRep.forall { case (id, rep) => id == rep })
    val splits = out.groupBy("split").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(splits.keySet == Set("train", "val", "test"))
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
  }

  // ---- mmrTopK ----

  test("mmrTopK: a redundant near-copy of pick 1 is demoted below a diverse result") {
    // query 0 along x; 1 and 2 tie on relevance (0.9) and are near-
    // copies (sim 0.821); 3 is less relevant (0.5) but diverse
    // (sim to 1 = 0.4). Demotion needs λ > (rel2−rel3)/(sim21−sim31)
    // = 0.4/0.421 ≈ 0.95 — at λ = 0.97, step 2 scores
    // m2 = 90 − 97·0.821 ≈ 10.36 < m3 = 50 − 97·0.4 = 11.2.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.9f, 0.11f)),
      (3L, Seq(0.5f, -0.5f))
    ).toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(df, "vec_id", "embedding",
        queryId = 0L, poolSize = 3, k = 3, lambdaNum = 97, lambdaDen = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(picks.map(_._2).toSeq == Seq(1L, 3L, 2L),
      s"diversity must beat redundancy at high lambda, got ${picks.toSeq}")
    // plain relevance order would be 1, 2, 3 (rel tie broken by id)
  }

  test("mmrTopK: lambda = 0 degrades to pure relevance order") {
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.8f, 0.2f)), (3L, Seq(0.7f, 0.3f))
    ).toDF("vec_id", "embedding")
    val picks = Similarity.mmrTopK(df, "vec_id", "embedding",
        queryId = 0L, poolSize = 3, k = 3, lambdaNum = 0, lambdaDen = 1)
      .collect().map(_.getLong(1)).toSeq
    assert(picks == Seq(1L, 2L, 3L))
  }

  // ---- semantic dedup (embedding pairs ∘ clusters ∘ keep) ----

  test("semantic dedup composition: one survivor (min id) per cosine cluster") {
    // vecs 1,2 nearly parallel (dot ≈ 1); 5 orthogonal to both
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 7),
      (2L, Seq(0.999f, 0.04f), 8),
      (5L, Seq(0.0f, 1.0f), 9)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", threshold = 0.9)
      .select("id_a", "id_b")
    val kept = Dedup.dropNearDuplicates(df.select("vec_id", "label"), "vec_id", pairs)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(kept.toSeq == Seq((1L, 7), (5L, 9)))
  }

  // ---- softDedupWeights ----

  test("softDedupWeights: cluster mass sums to 1, singletons keep weight 1, no row dropped") {
    val df = Seq((1L, "m"), (2L, "m"), (3L, "m"), (9L, "x")).toDF("doc_id", "meta")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.softDedupWeights(df, "doc_id", pairs)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep"),
                 r.getAs[Long]("cluster_size"), r.getAs[Double]("weight")))
    assert(out.length == 4)
    assert(out.toSeq == Seq(
      (1L, 1L, 3L, 1.0 / 3), (2L, 1L, 3L, 1.0 / 3),
      (3L, 1L, 3L, 1.0 / 3), (9L, 9L, 1L, 1.0)))
  }

  // ---- plan shapes (the 100 TB contract) ----

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // finalize the adaptive plan before reading it
    df.queryExecution.executedPlan.toString
  }

  test("passageDedup plan: no joins, dedup shuffle keyed on passage content") {
    val df = (0L until 200L).map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w$i"))
      .toDF("doc_id", "text")
    val plan = finalPlan(Dedup.passageDedup(df, "doc_id", "text", 2))
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    assert(plan.contains("hashpartitioning(passage"),
      s"dedup rank must shuffle on passage content:\n$plan")
  }

  test("selectByBudget plan: range exchange + per-partition window, never a global window") {
    val df = (0L until 300L).map(i => (i, i % 17 + 1)).toDF("id", "sz")
    val plan = finalPlan(
      Packing.selectByBudget(df, Seq(col("id").asc), "sz", budget = 500L))
    assert(plan.contains("rangepartitioning"),
      s"phase-1 range exchange missing:\n$plan")
    // Empty-partition Windows are allowed ONLY over the per-partition
    // totals (one row per partition); one whose frame mentions the raw
    // size column would be the single-task global scan this operator
    // exists to avoid.
    val globalWins =
      """Window \[[^\n]*\], \[\], \[[^\n]*""".r.findAllIn(plan).toList
    assert(globalWins.forall(_.contains("__total")),
      s"global (empty-partition) window on the data path:\n$plan")
    // Phases 2 and 3 must read the SAME materialized range exchange —
    // sampled-boundary + partition-id consistency between the totals
    // branch and the running-sum branch is what makes the scan exact.
    assert(plan.contains("ReusedExchange") ||
        "ShuffleQueryStage (\\d+)".r.findAllMatchIn(plan)
          .map(_.group(1)).toList.groupBy(identity).exists(_._2.size > 1),
      s"range exchange not reused between phases:\n$plan")
  }

  test("containmentPairs plan: equi-join candidates, no cartesian or nested loop") {
    val df = (0L until 300L).map(i => (i, s"w${i % 9} w${i % 7} w${i % 5} w${i % 3} w$i"))
      .toDF("doc_id", "text")
    val plan = finalPlan(Dedup.containmentPairs(df, "doc_id", "text", 9, 10))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
  }

  test("unigramLogProb plan: no cartesian; the stats row is a literal, not a join") {
    val df = (0L until 300L).map(i => (i, s"tok${i % 11} tok${i % 5} tok$i"))
      .toDF("doc_id", "text")
    val plan = finalPlan(CorpusStats.unigramLogProb(df, "doc_id", "text"))
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
    // exactly one join (tokens x vocab); N+V was inlined on the driver
    assert(plan.split("Join", -1).length - 1 <= 2, s"more joins than tokens-vocab:\n$plan")
  }

  test("temperatureMix plan: rate join broadcasts; the corpus is never sort-merge joined") {
    val df = (0L until 500L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "grp")
    val plan = finalPlan(Sampling.temperatureMix(df, "doc_id", "grp"))
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for a KB join:\n$plan")
  }

  // ---- hybridRrf ----

  test("hybridRrf: docs in both pools outrank single-pool docs; absent ranks contribute 0") {
    // doc 1: lexical hit AND nearest vector; doc 2: lexical only;
    // doc 3: vector only; doc 4: neither
    val docs = Seq(
      (1L, "apple pie recipe"),
      (2L, "apple orchard"),
      (3L, "quantum flux"),
      (4L, "unrelated words here")
    ).toDF("doc_id", "text")
    val embeds = Seq(
      (0L, Array(1.0f, 0.0f)),  // the query vector
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.0f)), // anti-aligned: bottom of the sem pool
      (3L, Array(0.8f, 0.2f)),
      (4L, Array(-0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hybridRrf(docs, "doc_id", "text", embeds, "vec_id",
        "embedding", terms = Seq("apple"), queryId = 0L, poolK = 2, topK = 4)
      .collect()
    val byId = out.map(r => r.getLong(0) ->
      (Option(r.get(1)), Option(r.get(2)), r.getDouble(3), r.getLong(4))).toMap
    // doc 1 is in both top-2 pools → highest fused score
    assert(byId(1L)._4 == 1L)
    assert(byId(1L)._1.nonEmpty && byId(1L)._2.nonEmpty)
    // doc 3 is semantic-only: null lexical rank, positive score
    assert(byId(3L)._1.isEmpty && byId(3L)._2.nonEmpty && byId(3L)._3 > 0.0)
    // doc 2 is lexical-only (anti-aligned vector misses the sem pool)
    assert(byId(2L)._1.nonEmpty && byId(2L)._2.isEmpty)
    // doc 4 matches neither pool → not returned at all
    assert(!byId.contains(4L))
  }

  test("hybridRrf: rrf scores are 1/(k+rank) sums") {
    val docs = Seq((1L, "apple"), (2L, "apple apple")).toDF("doc_id", "text")
    val embeds = Seq(
      (0L, Array(1.0f)), (1L, Array(0.5f)), (2L, Array(0.25f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.hybridRrf(docs, "doc_id", "text", embeds, "vec_id",
        "embedding", terms = Seq("apple"), queryId = 0L, kRrf = 60,
        poolK = 2, topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 2: bm25 rank 1 (higher tf), sem rank 2; doc 1: bm25 2, sem 1
    assert(out(2L) == 1.0 / 61 + 1.0 / 62)
    assert(out(1L) == 1.0 / 62 + 1.0 / 61)
  }

  // ---- selectByBudget ----

  test("selectByBudget: keeps rows while the exclusive prefix is under budget") {
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L)).toDF("id", "sz")
    def ids(budget: Long) =
      Packing.selectByBudget(df, Seq(col("id").asc), "sz", budget)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    // budget 8: row 3 starts exactly at the budget → excluded
    assert(ids(8) == Seq(1L, 2L))
    // budget 9: row 3 starts at 8 < 9 → the crossing row is included
    assert(ids(9) == Seq(1L, 2L, 3L))
    // tiny budget still selects the first row
    assert(ids(1) == Seq(1L))
  }

  test("selectByBudget: order columns drive the selection, not input order") {
    val df = Seq((1L, 0.1, 5L), (2L, 0.9, 5L), (3L, 0.5, 5L))
      .toDF("id", "score", "sz")
    val got = Packing.selectByBudget(df,
        Seq(col("score").desc, col("id").asc), "sz", budget = 10L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(2L, 3L)) // two best scores, not two smallest ids
  }

  test("selectByBudget: stable under repartitioning, cum matches a window sum") {
    val df = (0L until 500L).map(i => (i, (i * 37 % 23) + 1)).toDF("id", "sz")
    val out = Packing.selectByBudget(df.repartition(13),
        Seq(col("id").asc), "sz", budget = 3000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    // oracle: driver-side running sum in id order
    var cum = 0L
    val exp = (0L until 500L).map { i => cum += (i * 37 % 23) + 1; (i, cum) }
      .takeWhile { case (_, c) => true }
      .filter { case (i, c) => c - ((i * 37 % 23) + 1) < 3000L }
    assert(out.toSeq == exp)
  }

  // ---- temperatureMix ----

  test("temperatureMix: smallest group kept whole, large groups downsampled") {
    val df = (0L until 400L).map(i => (i, if (i < 360) "big" else "small"))
      .toDF("doc_id", "grp")
    val out = Sampling.temperatureMix(df, "doc_id", "grp", alpha = 0.5)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("small") == 40) // c == cmin short-circuit: all kept
    // rate = sqrt(40/360) = 1/3; 360 rows sampled at 1/3 — allow a
    // generous binomial band around 120
    assert(byGrp("big") > 80 && byGrp("big") < 160)
  }

  test("temperatureMix: alpha = 1 keeps the natural distribution") {
    val df = (0L until 100L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("doc_id", "grp")
    assert(Sampling.temperatureMix(df, "doc_id", "grp", alpha = 1.0).count() == 100)
  }

  test("temperatureMix: deterministic and stable under repartitioning") {
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val a = Sampling.temperatureMix(df, "doc_id", "grp").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.temperatureMix(df.repartition(7), "doc_id", "grp")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("temperatureMix rejects non-integral uids and bad alpha") {
    val df = Seq(("x", "g")).toDF("doc_id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "doc_id", "grp")
    }
    val ok = Seq((1L, "g")).toDF("doc_id", "grp")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(ok, "doc_id", "grp", alpha = 0.0)
    }
  }

  test("passageDedup: first occurrence is by (doc_id, p_idx), not input order") {
    // same passage at different positions: doc 5 position 1 vs doc 6
    // position 0 — doc 5 wins on doc id regardless of position
    val df = Seq((6L, "z z p q"), (5L, "m n p q")).toDF("doc_id", "text")
    val out = passageRows(Dedup.passageDedup(df, "doc_id", "text", passageTokens = 2))
    assert(out.toSeq == Seq(
      (5L, 2L, 2L, "m n p q"),
      (6L, 2L, 1L, "z z")))
  }
}
