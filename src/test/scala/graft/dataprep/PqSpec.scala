package graft.dataprep

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: codebook training, ADC ranking, rerank. */
class PqSpec extends SparkSpec {

  private def emb = graft.tables.TestTables.embeddings(spark, sfDir)

  test("codebooks: m subspaces, kSub centroids each, full subvector dims") {
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, kSub = 8, iters = 2)
    assert(books.length == 4)
    assert(books.forall(_.length == 8))
    assert(books.flatten.forall(_.length == 16))
    // deterministic: a second training run is identical
    val again = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
      m = 4, kSub = 8, iters = 2)
    assert(books == again)
  }

  test("ADC self-distance: a vector's own codes give the minimal LUT sum to itself") {
    // query 0 excluded from its own result; its nearest ADC neighbors
    // must all carry adist >= 0 and ranks 1..k without gaps
    val out = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryIds = Seq(0L), k = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(2)).toSeq == (1L to 10L))
    assert(out.forall(_.getLong(3) >= 0L))
    assert(out.forall(_.getLong(1) != 0L))
  }

  test("rerank with shortlist >= corpus equals exact integer-distance top-k") {
    val n = emb.count().toInt
    val reranked = Similarity.pqRerankTopK(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 5, shortlist = n).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // brute force on the same e6 lattice
    val pts = emb.select(col("vec_id").as("id"),
      expr("transform(CAST(embedding AS ARRAY<DOUBLE>), x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val expected = Seq(0L, 1L).flatMap { q =>
      pts.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, pts(q).zip(v).map { case (a, b) => val d = a - b; d * d }.sum) }
        .sortBy { case (id, d) => (d, id) }.take(5).zipWithIndex
        .map { case ((id, d), i) => (q, id, (i + 1).toLong, d) }
    }
    assert(reranked == expected)
  }

  test("IVF-PQ: candidates come only from probed cells; plan is equi-joins only") {
    val out = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = 10)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(3) >= 0L))
    // every reported neighbor must rank no better under full-corpus ADC
    // (IVF pruning can only REMOVE candidates, never invent them)
    val full = Similarity.pqTopK(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L), k = Int.MaxValue - 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    rows.foreach { r =>
      assert(full((r.getLong(0), r.getLong(1))) == r.getLong(3),
        "ADC distance must not depend on the probing")
    }
    // plan: no nested loop of any kind — cell probe and LUT attach are
    // broadcast EQUI-joins (this op needs no BNLJ allowance at all)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ADC scan plan: no shuffle before the ranked window (scan + broadcast only)") {
    val df = Similarity.pqTopK(emb, "vec_id", "embedding", queryIds = Seq(0L), k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // the corpus side must reach the window without an Exchange other
    // than the final rank partitioning; no SortMergeJoin / cartesian
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
