package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurateSpec extends SparkSpec {
  import spark.implicits._

  // small synthetic corpus: quality junk, a zh doc, exact dups,
  // near-dups, and a benchmark-contaminated doc
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog and runs far away home", "srcA"),
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home", "srcA"), // exact dup of 0
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house", "srcA"), // near dup of 0
    (3L, "a completely different document about spark partitions and shuffle behavior in the cluster", "srcB"),
    (4L, "spam spam spam spam spam spam spam spam", "srcB"), // fails quality (distinct ratio 1/8)
    (5L, "世界 你好 世界 你好 世界 你好 世界 你好 世界 你好 世界 你好 世界 你好", "srcB"), // zh → language-gated
    (6L, "benchmark eval suite question answer pairs used to测试", "srcC"),
  ).toDF("doc_id", "text", "source")

  private val cfg = Curate.Config(
    minQuality = 0.2, keepLangs = Seq("en"), minOverlap = 3,
    // verification threshold low enough that doc 2 pairs with doc 0
    thresholdNum = 1, thresholdDen = 2)

  test("pipeline: gates, dedup, decontamination and split compose") {
    val out = Curate.pipeline(docs, "doc_id", "text", "source",
      benchPred = col("doc_id") === 6L, cfg).collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(!ids.contains(4L), "quality gate")
    assert(!ids.contains(5L), "language gate")
    assert(!ids.contains(6L), "bench doc removed from corpus")
    assert(!ids.contains(1L), "exact dup dropped (min-id representative kept)")
    assert(ids.contains(0L) && !ids.contains(2L), "near-dup representative is min id")
    assert(ids.contains(3L), "clean doc survives")
    // provenance columns present, split assigned
    assert(out.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    assert(out.forall(r => r.getAs[String]("pred_lang") == "en"))
  }

  test("pipeline is deterministic and subset-monotone under repartition") {
    val a = Curate.pipeline(docs, "doc_id", "text", "source", lit(false), cfg)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Curate.pipeline(docs.repartition(7), "doc_id", "text", "source", lit(false), cfg)
      .select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("report: audit counts per stage") {
    val rep = Curate.report(docs, "doc_id", "text", "source",
      benchPred = col("doc_id") === 6L, cfg)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("input") == 7L)
    assert(rep("kept") == rep.filterNot { case (k, _) => k == "input" || k == "kept" }.values.sum)
    assert(rep("kept") == 2L) // docs 0 and 3
  }
}
