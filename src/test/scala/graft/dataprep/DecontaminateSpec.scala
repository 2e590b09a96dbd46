package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"), // bench
    (1L, "the quick brown fox jumps over the lazy cat"), // heavy overlap
    (2L, "quick brown animals and lazy dogs elsewhere"), // slight overlap
    (3L, "completely different words appear in this one"), // clean
  ).toDF("doc_id", "text")

  private def rep(minOverlap: Int) =
    Decontaminate.report(df, "doc_id", "text", col("doc_id") === 0, minOverlap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("report counts distinct shared shingles per corpus doc") {
    val r = rep(1)
    // doc1 shares 7 of its 8 bigrams with doc0 (all but "lazy cat");
    // doc2 shares 1 ("quick brown"); doc3 shares none
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L) == 7L)
    assert(r(2L) == 1L)
  }

  test("minOverlap thresholds the report and clean() drops flagged docs") {
    assert(rep(2).keySet == Set(1L))
    val cleaned = Decontaminate.clean(df, "doc_id", "text", col("doc_id") === 0, 2)
      .select("doc_id").as[Long].collect().toSet
    // bench doc excluded, contaminated doc1 dropped
    assert(cleaned == Set(2L, 3L))
  }

  // ---- bloom path ----

  test("reportBloom at a roomy size equals the exact report; probes run map-side") {
    val bloom = Decontaminate.benchBloom(df, "doc_id", "text",
      col("doc_id") === 0, numBits = 1 << 16, numHashes = 5)
    val b = Decontaminate.reportBloom(df, "doc_id", "text",
        col("doc_id") === 0, 1, bloom)
    // 16k bits for 8 bench shingles → FP rate ≈ 0: counts are exact
    assert(b.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 7L, 2L -> 1L))
    val plan = { b.collect(); b.queryExecution.executedPlan.toString }
    assert(!plan.contains("Join") && !plan.contains("Generate"),
      s"bloom path must not explode or join:\n$plan")
  }

  test("bloom overlap is an upper bound: never below the exact count, even when tiny") {
    // 64 bits for 8+ shingles → heavy FP rate, counts can only inflate
    val bloom = Decontaminate.benchBloom(df, "doc_id", "text",
      col("doc_id") === 0, numBits = 64, numHashes = 2)
    val exact = rep(1)
    val b = Decontaminate.reportBloom(df, "doc_id", "text",
        col("doc_id") === 0, 1, bloom)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (id, n) =>
      assert(b.getOrElse(id, 0L) >= n, s"doc $id: bloom ${b.get(id)} < exact $n")
    }
    val cleanedExact = Decontaminate.clean(df, "doc_id", "text",
      col("doc_id") === 0, 2).select("doc_id").as[Long].collect().toSet
    val cleanedBloom = Decontaminate.cleanBloom(df, "doc_id", "text",
      col("doc_id") === 0, 2, numBits = 64, numHashes = 2)
      .select("doc_id").as[Long].collect().toSet
    // bloom may drop more (false positives) but never keeps a doc the
    // exact path drops
    assert(cleanedBloom.subsetOf(cleanedExact))
  }

  test("benchBloom with an empty bench side flags nothing") {
    val bloom = Decontaminate.benchBloom(df, "doc_id", "text",
      lit(false), numBits = 1024, numHashes = 3)
    val got = Decontaminate.reportBloom(df, "doc_id", "text",
      lit(false), 1, bloom).count()
    assert(got == 0L)
  }

  test("embeddingDecontaminate: single-scan MaxDotExpr equals the join+max form; empty bench -> empty") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),   // dot 1.0 with b1 -> dropped
      (2L, Seq(0.0, 1.0, 0.0)),   // max dot 0.2 -> kept
      (3L, Seq(0.3, 0.1, 0.0)),   // max dot 0.31 -> kept (strict <)
      (4L, Seq(0.0, 0.0, 0.9))    // max dot 0.36 -> dropped at 0.35
    ).toDF("vec_id", "embedding")
    val bench = Seq(
      (100L, Seq(1.0, 0.1, 0.0)),
      (101L, Seq(0.0, 0.2, 0.4))
    ).toDF("vec_id", "embedding")
    val out = Similarity.embeddingDecontaminate(
      corpus, bench, "vec_id", "embedding", threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((2L, 200000L), (3L, 310000L)))
    // the reference formulation: broadcast join + per-pair dot + MAX
    val joined = corpus.select(col("vec_id"), col("embedding").as("v"))
      .join(broadcast(bench.select(col("embedding").as("bv"))))
      .groupBy("vec_id")
      .agg(max(graft.functions.VectorExpressions.dotProduct(col("v"), col("bv"))).as("m"))
      .where(col("m") < 0.35)
      .select(col("vec_id"), expr("CAST(floor(m * 1000000 + 0.5) AS BIGINT)"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == joined.toSeq)
    // empty benchmark keeps the join semantics: empty output
    val none = Similarity.embeddingDecontaminate(
      corpus, bench.limit(0), "vec_id", "embedding", threshold = 0.35)
    assert(none.count() == 0L)
    assert(none.columns.toSeq == Seq("id", "max_dot_e6"))
  }
}
