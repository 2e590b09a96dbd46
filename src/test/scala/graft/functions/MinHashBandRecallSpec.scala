package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regression for the affine-coefficient MinHash pathology the
  * round-9 sf1 rehearsal caught: with a_i, b_i derived LINEARLY from
  * the permutation index, h_i(x) ≡ (i+1)·K(x) + xm (mod P), so one
  * element can be the minimum on an arithmetic progression of i —
  * the pair below (true bigram-Jaccard 21/23 ≈ 0.91) shared 0 of 32
  * bands because the left doc's unique shingle won every i ≡ 2
  * (mod 4), one row of every 4-row band. With splitmix64-mixed
  * coefficients ([[MinHashCoefficients]]) the expected shared-band
  * count is ≈ 32·(21/23)⁴ ≈ 22.
  */
class MinHashBandRecallSpec extends SparkSpec {
  import spark.implicits._

  private val left = "v1x 1888 stream key line customer query merge the " +
    "order filter data customer key fast window part batch join customer slow row key"
  private val right = "v2x 1888 stream key line customer query merge the " +
    "order filter data customer key fast window part batch join customer slow row key"

  test("the sf1 split pair shares bands again (and plenty of them)") {
    val rows = Seq(left, right).toDF("text")
      .select(VectorExpressions.minhashBandKeys(
        TokenizeExpr.bigramHashes(
          graft.dataprep.TextPrep.tokens(col("text"))), 128, 32).as("bk"))
      .collect().map(_.getSeq[Long](0))
    val shared = rows(0).zip(rows(1)).count { case (a, b) => a == b }
    assert(shared >= 8, s"J≈0.91 pair shares only $shared of 32 bands")
  }

  test("banding collision rate at threshold J matches the independence model") {
    // With INDEPENDENT permutations, a pair at Jaccard J shares a band
    // with p = 1 − (1 − J^r)^b. The affine family broke exactly this:
    // its per-band agreement was structurally coupled across bands.
    // 300 deterministic pairs at J = 20/40 = 0.5 (20 shared + 10+10
    // unique shingle hashes each) ⇒ expected p ≈ 0.873 at r=4, b=32;
    // assert the empirical rate is in a wide window around it — a
    // correlated family lands far outside (the old one measured
    // pathological all-or-nothing patterns).
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 300).map { _ =>
      val shared = Seq.fill(20)(rnd.nextLong())
      val a = (shared ++ Seq.fill(10)(rnd.nextLong())).sorted
      val b = (shared ++ Seq.fill(10)(rnd.nextLong())).sorted
      (a, b)
    }
    val df = pairs.toDF("a", "b")
    val hits = df.select(
        VectorExpressions.minhashBandKeys(col("a"), 128, 32).as("ba"),
        VectorExpressions.minhashBandKeys(col("b"), 128, 32).as("bb"))
      .collect()
      .count(r => r.getSeq[Long](0).zip(r.getSeq[Long](1)).exists(t => t._1 == t._2))
    val rate = hits / 300.0
    // binomial(300, 0.873) 5σ window ≈ ±0.096
    assert(rate > 0.75 && rate <= 1.0, s"empirical band-collision rate $rate at J=0.5")
  }

  test("high-J neighbours always share a band across a corpus of variants") {
    // 200 base docs, each with a 1-token-prefix variant (J well above
    // the 0.5 threshold): banding at 128/32 must surface every pair.
    val words = Seq("stream", "key", "line", "customer", "query", "merge",
      "the", "order", "filter", "data", "fast", "window", "part", "batch")
    val docs = (0 until 200).flatMap { i =>
      val base = (0 until 18).map(j => words((i * 7 + j * 3) % words.size)).mkString(" ")
      Seq((i.toLong, base), (i + 1000L, s"p${i}q $base"))
    }
    val bk = docs.toDF("id", "text")
      .select(col("id"), VectorExpressions.minhashBandKeys(
        TokenizeExpr.bigramHashes(
          graft.dataprep.TextPrep.tokens(col("text"))), 128, 32).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val misses = (0 until 200).filter { i =>
      !bk(i.toLong).zip(bk(i + 1000L)).exists { case (a, b) => a == b }
    }
    assert(misses.isEmpty, s"pairs with no shared band: $misses")
  }
}
