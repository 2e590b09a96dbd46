package graft.dataprep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing: assign documents to fixed-token-budget shards in
  * stable id order — the step that turns a cleaned corpus into training
  * shards ("pack docs into ~budget-token files, preserving order").
  *
  * Semantics: with `cum(i)` = sum of sizes of all rows with id < row i's
  * id (exclusive prefix sum in id order),
  * `shard = floor(cum / budget)` — contiguous, deterministic, and
  * engine-independent (a plain windowed SUM in ANSI SQL).
  *
  * Scale design: the textbook formulation is a global window
  * (`sum(size) OVER (ORDER BY id)`), which Spark executes by moving the
  * ENTIRE dataset into one task — dead at 100 TB. Instead we do the
  * classic two-phase distributed prefix sum:
  *   1. range-partition the thin (id, size) projection by id, so
  *      partition k holds a contiguous id range and partitions are
  *      ordered (range partition indexes ascend with the key);
  *   2. one tiny job computes per-partition totals (one row per
  *      partition, collected to the driver);
  *   3. each partition adds its broadcast base offset to a
  *      partition-local running sum.
  * Total cost: one shuffle of the thin projection + an O(#partitions)
  * driver exchange — every stage parallel, nothing global.
  *
  * The range-partitioned frame is persisted because its partition
  * boundaries come from reservoir sampling: phases 2 and 3 must see the
  * SAME physical partitioning, so the exchange must not be recomputed
  * between the two actions.
  */
object Packing {

  /** Distributed inclusive prefix sum of `sizeCol` (already long) in
    * the total order given by `orderCols` — the two-phase scan
    * described above, generic over the ordering so both id-order
    * packing and quality-order budget selection ride it. Appends `cum`.
    */
  private def withCum(df: DataFrame, orderCols: Seq[Column],
      sizeCol: String): DataFrame = {
    val spark = df.sparkSession
    val part = df.repartitionByRange(orderCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // phase 2: per-partition totals → base offsets (exclusive scan over
    // partition ids, which for a range exchange ascend with the key)
    val partTotals = part
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(sizeCol).as("__total"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.map { case (pid, total) =>
      val base = acc; acc += total; (pid, base)
    }
    val offsetsDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__base")

    // phase 3: partition-local running sum + broadcast base offset
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part.withColumn("__pid", spark_partition_id())
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("cum", col("__base") + sum(col(sizeCol)).over(w))
      .drop("__pid", "__base")
  }

  /** @param df      input; `idCol` must be unique (it defines the order)
    * @param idCol   unique orderable id
    * @param sizeCol per-row size (tokens/bytes); cast to long
    * @param budget  shard capacity in the same unit as sizeCol
    * @return (idCol, sizeCol, cum, shard) — `cum` is the INCLUSIVE prefix
    *         sum (matches `sum() OVER (ORDER BY id)` in SQL), `shard`
    *         uses the exclusive prefix `cum - size`
    */
  def packShards(df: DataFrame, idCol: String, sizeCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val thin = df.select(col(idCol), col(sizeCol).cast("long").as(sizeCol))
    withCum(thin, Seq(col(idCol).asc), sizeCol)
      .withColumn("shard", floor((col("cum") - col(sizeCol)) / budget))
      .select(col(idCol), col(sizeCol), col("cum"), col("shard"))
      .orderBy(col(idCol).asc)
  }

  /** Budget-capped ordered selection: walk the corpus in the total
    * order given by `orderCols` (e.g. quality descending) and keep
    * rows until `budget` units of `sizeCol` are consumed — "take the
    * best documents until the token budget is full", the data-mixture
    * step that turns a scored corpus into a fixed-size training set.
    *
    * A row is kept iff the budget was not yet exhausted when it is
    * reached (exclusive prefix `cum - size < budget`), so the row that
    * crosses the boundary is included and the selection is never empty
    * for a positive budget. Appends `cum`; same two-phase distributed
    * scan as [[packShards]] — no global window, no driver data path.
    *
    * `orderCols` must induce a TOTAL order (break score ties with a
    * unique id) or the selection at the boundary is nondeterministic.
    */
  def selectByBudget(df: DataFrame, orderCols: Seq[Column],
      sizeCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    withCum(df.withColumn(sizeCol, col(sizeCol).cast("long")),
        orderCols, sizeCol)
      .where(col("cum") - col(sizeCol) < budget)
  }
}
