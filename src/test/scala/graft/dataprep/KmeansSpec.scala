package graft.dataprep

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer-lattice Lloyd k-means ([[Similarity.kmeansAssign]]):
  * partitioning-independence (the whole point of the integer
  * arithmetic), convergence toward obvious cluster structure, and the
  * empty-cell / tie-break edges.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("separable clusters land in distinct cells; assignment is partitioning-independent") {
    // two tight groups far apart, k=2 seeded from ids 0 and 1 (one in
    // each group so Lloyd converges in one update)
    val df = vecs(
      0L -> Seq(0.0, 0.0), 2L -> Seq(0.1, 0.0), 4L -> Seq(0.0, 0.1),
      1L -> Seq(9.0, 9.0), 3L -> Seq(9.1, 9.0), 5L -> Seq(9.0, 9.1))
    val a = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a(0L) == a(2L) && a(2L) == a(4L))
    assert(a(1L) == a(3L) && a(3L) == a(5L))
    assert(a(0L) != a(1L))

    val b = Similarity.kmeansAssign(df.repartition(7), "vec_id", "embedding",
      k = 2, iters = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b) // integer lattice ⇒ identical under any partitioning
  }

  test("equidistant point ties to the lowest cell; a cell that loses all members keeps its centroid") {
    // seeds 0 and 1 coincide → every point equidistant at iteration 1
    // → all assigned to cell 0 → cell 1 empties and must keep its old
    // centroid instead of dividing by zero
    val df = vecs(0L -> Seq(1.0, 1.0), 1L -> Seq(1.0, 1.0), 2L -> Seq(1.0, 1.0))
    val a = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 3)
    val cells = a.collect().map(_.getLong(1)).toSeq
    assert(cells == Seq(0L, 0L, 0L), cells)
  }

  test("dist is the exact integer squared-L2 in e12 units") {
    val df = vecs(0L -> Seq(0.0), 1L -> Seq(0.003))
    // k=1: both assigned to the seed centroid at [0]; 0.003 → 3000 e6
    val a = Similarity.kmeansAssign(df, "vec_id", "embedding", k = 1, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a(0L) == 0L && a(1L) == 3000L * 3000L, a)
  }
}
