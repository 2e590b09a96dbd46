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
}
