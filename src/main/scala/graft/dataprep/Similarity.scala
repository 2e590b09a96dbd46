package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float|Double]).
  * Brute-force cosine/dot top-k as the exact baseline; deterministic
  * random-hyperplane LSH bucketing as the scale path (probe only
  * matching buckets instead of the full corpus).
  */
object Similarity {

  /** Dot product via a native codegen expression (tight primitive loop,
    * no intermediate array per pair — graft.functions.DotProductExpr).
    * Accumulates left-to-right, bit-identical to an ordered fold /
    * DuckDB's list_dot_product. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** HOF reference formulation of [[dot]] (kept for cross-checking the
    * native expression in tests). */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by dot product for the given query ids: broadcast the
    * queries, score the whole corpus once, rank per query. One shuffle
    * (the per-query window sort); the scoring itself is map-side.
    * Output: query_id, neighbor_id, rank (1-based), dot_e6.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val corpus = df.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("v"))
    val queries = df.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q"))
    val scored = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot(col("q"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        expr("CAST(round(dot * 1000000) AS BIGINT)").as("dot_e6"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane p is
    * derived from xxhash64(p, j), mapped to [-0.5, 0.5). Expressed as
    * columns so the whole signature stays inside codegen.
    */
  private def planeComponent(p: Column, j: Column): Column =
    (pmod(xxhash64(p, j), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of projections
    * onto deterministic hyperplanes (native kernel with plane cache —
    * graft.functions.LshBucketsExpr). Vectors in the same bucket are
    * near-collinear with high probability. */
  def lshBuckets(vec: Column, nBits: Int): Column =
    graft.functions.VectorExpressions.lshBuckets(vec, nBits)

  /** HOF reference formulation of [[lshBuckets]] (kept for parity
    * testing of the native kernel). */
  def lshBucketsHof(vec: Column, nBits: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nBits - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, j) => x * planeComponent(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(nBits - 1)), (b, i) => call_function("shiftleft", b, i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Map-side argmin over DRIVER-HELD centroids: the centroid table is
    * KBs (nCells × dim doubles), so it embeds as literals and cell
    * assignment is a pure projection — no join, no window, no shuffle.
    * This is the shape IVF takes at corpus scale: the index metadata
    * lives with the planner, the data never moves for assignment.
    * Ties break (dist asc, cell asc) like the reference ordering.
    */
  private def scoredCells(v: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    // True squared-distance argmin: |v−c|² = |v|² − 2v·c + |c|², and
    // |v|² is constant per row, so the sort key is |c|² − 2v·c (a plain
    // −dot would bias toward large-norm centroids once Lloyd means
    // shrink below unit norm). |c|² is an ordered driver-side fold —
    // the oracle recomputes it with the same op order.
    // array_sort on structs orders lexicographically: (dist asc, cell asc)
    array_sort(array(centroids.map { case (cell, cv) =>
      val c2 = cv.foldLeft(0.0)((acc, x) => acc + x * x)
      struct((lit(c2) - lit(2.0) * dot(v, typedlit(cv))).as("dist"), lit(cell).as("cell"))
    }: _*))

  private def argminCell(v: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    scoredCells(v, centroids).getItem(0)

  /** (id, v, cell) via [[argminCell]]. */
  private def assignCells(points: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame =
    points.select(col("neighbor_id"), col("v"),
      argminCell(col("v"), centroids).getField("cell").as("cell"))

  /** Deterministic k-means training for IVF: seed centroids are the
    * `nCells` lowest-id vectors, then `iters` Lloyd steps driven from
    * the driver (one tiny collect per step — standard k-means shape).
    * Each new centroid component is an EXACT integer mean: components
    * quantize to e6 fixed-point, integer-sum per (cell, dim) — an
    * associative, commutative reduction, so the result is identical
    * for any partitioning or merge order (a float mean would depend on
    * both) — then one double division. Cells that lose all members
    * drop out (matching a verification oracle that mirrors the same
    * arithmetic).
    */
  /** `points` must have columns (neighbor_id, v: array<double>) — the
    * same shape [[assignCells]] consumes. */
  def trainIvfCentroids(points: DataFrame, nCells: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    var cent: Seq[(Long, Seq[Double])] = points.orderBy(col("neighbor_id").asc).limit(nCells)
      .select(col("neighbor_id").as("cell"), col("v").as("cv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (_ <- 1 to iters) {
      cent = assignCells(points, cent)
        .select(col("cell"), posexplode(col("v")))
        .withColumn("xi", expr("CAST(round(col * 1000000) AS BIGINT)"))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("xi")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("n")))).as("a"))
        .select(col("cell"), transform(col("a"), t =>
          t.getField("s").cast("double") / (t.getField("n").cast("double") * lit(1000000.0))).as("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
        .sortBy(_._1)
    }
    cent
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nCells`
    * Voronoi cells around k-means centroids trained with `trainIters`
    * deterministic Lloyd steps (seeds = lowest-id vectors), then
    * answer queries by exact-scoring only the `nProbe` nearest cells.
    * The cell id becomes the shuffle/storage key at scale: each query
    * touches nProbe/nCells of the corpus instead of all of it.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nCells: Int = 16, nProbe: Int = 4,
      trainIters: Int = 2): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val points = df.select(col(idCol).as("neighbor_id"), v.as("v"))
    val centroids = trainIvfCentroids(points, nCells, trainIters)
    val assigned = assignCells(points, centroids)
    // queries probe their nProbe nearest cells — again a pure
    // projection over the driver-held centroids, then explode
    val probes = df.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), v.as("q"),
        explode(transform(
          slice(scoredCells(v, centroids), 1, nProbe),
          s => s.getField("cell"))).as("cell"))
    val cands = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("dot", dot(col("q"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        expr("CAST(round(dot * 1000000) AS BIGINT)").as("dot_e6"))
      .orderBy("query_id", "rank")
  }

  /** Approximate top-k: LSH-bucket the corpus, probe only buckets
    * within `probeHamming` bits of the query's bucket (explode of
    * nearby buckets — multi-probe LSH), exact-rank the candidates.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by design —
    * this is the 100 TB path where scoring the full corpus per query
    * is not an option.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nBits: Int = 12, probeHamming: Int = 1): DataFrame = {
    val bucketed = df.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("v"),
      lshBuckets(col(vecCol).cast("array<double>"), nBits).as("bucket"))
    // query probes its own bucket plus all buckets within hamming 1
    val queries = df.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q"),
        lshBuckets(col(vecCol).cast("array<double>"), nBits).as("qb"))
      .withColumn("probe",
        if (probeHamming >= 1)
          explode(concat(array(col("qb")),
            transform(sequence(lit(0), lit(nBits - 1)),
              i => col("qb").bitwiseXOR(call_function("shiftleft", lit(1L), i)))))
        else col("qb"))
    val cands = bucketed.join(broadcast(queries),
        col("bucket") === col("probe") && col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("dot", dot(col("q"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        expr("CAST(round(dot * 1000000) AS BIGINT)").as("dot_e6"))
      .orderBy("query_id", "rank")
  }
}
