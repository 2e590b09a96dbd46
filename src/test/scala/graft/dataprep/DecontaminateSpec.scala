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
}
