package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two quantized
  * sort keys so that files cut from the sorted order stay tight in
  * BOTH dimensions at once. A single-key sort gives perfect min/max
  * locality on that key and none on any other; the Morton curve trades
  * a little locality on each axis for locality on all of them — after
  * `repartitionByRange(z) + sortWithinPartitions(z)`, every output
  * file covers a small rectangle of (a, b) space, so a
  * [[graft.index.ZoneMapIndex]] sidecar (or parquet row-group stats)
  * prunes selective probes on EITHER column or both. This is the
  * standard lakehouse answer (Delta OPTIMIZE ZORDER BY) to the
  * reference's single-axis weakness: its fractions bound only time
  * (`fracmanager/searcher.go:89-101`), so a `user_id:42` needle over a
  * month still walks every fraction; a (user, time) Z-layout touches
  * ~√F of F files for a user probe and stays ~as good as a time sort
  * for time probes.
  *
  * Everything here is plain `Column` bit arithmetic (shifts/masks —
  * whole-stage codegen'd), no UDFs; the quantization bounds are
  * computed once per build in one tiny agg job.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0,2,4,…,30)
    * — the classic mask-shift cascade, on longs throughout.
    */
  private[ingest] def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = (x0.bitwiseOR(shiftleft(x0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val x2 = (x1.bitwiseOR(shiftleft(x1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = (x2.bitwiseOR(shiftleft(x2, 2))).bitwiseAND(lit(0x33333333L))
    (x3.bitwiseOR(shiftleft(x3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit cell coordinates: a's bits land
    * on even positions, b's on odd. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Quantize a long column into its 16-bit cell index for the closed
    * value range [lo, hi]: linear map to [0, 65535], constant when the
    * range is degenerate, nulls to cell 0 (a null never matches a
    * range probe, so its placement only affects layout, not results).
    * 128-bit-safe: the (v - lo) × 65535 product is DECIMAL(38,0) so a
    * full-range long axis (e.g. epoch millis) cannot overflow.
    */
  def quantize16(v: Column, lo: Long, hi: Long): Column = {
    require(hi >= lo, s"bad quantization range [$lo, $hi]")
    if (hi == lo) lit(0L)
    else {
      // all arithmetic in decimal: a full-range long axis overflows
      // both the (v - lo) subtraction (ANSI error) and the Scala-side
      // (hi - lo) literal, so the range is a driver-side BigDecimal
      val range = (BigDecimal(hi) - BigDecimal(lo)).bigDecimal
      val num = (coalesce(v.cast("long"), lit(lo)).cast("decimal(38,0)") -
        lit(lo).cast("decimal(38,0)")) * lit(65535L).cast("decimal(38,0)")
      (num / lit(range)).cast("decimal(38,0)").cast("long")
    }
  }

  /** Write `df` as parquet Z-clustered on two long-valued columns:
    * one agg job for the axis bounds, one range exchange + in-task
    * sort on the Morton code, then a [[graft.index.ZoneMapIndex]]
    * build over both axes so reads prune the file list driver-side.
    * The z column itself is dropped before the write — it is a layout
    * device, not data. Extra dimensions compose the same way (spread
    * every k-th bit); two covers the dominant (entity, time) access
    * pattern so that is what we ship.
    */
  def writeClustered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Option[Int] = None): Unit = {
    val b = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      s"cannot Z-cluster on all-null column(s) $colA/$colB")
    val z = morton2(
      quantize16(col(colA), b.getLong(0), b.getLong(1)),
      quantize16(col(colB), b.getLong(2), b.getLong(3)))
    val zd = df.withColumn("__z", z)
    // explicit file count pins the exchange (AQE would coalesce a
    // small input to ONE file — no rectangles, nothing to prune);
    // default lets AQE size partitions by bytes, which at real scale
    // is the behavior you want (files ≈ advisory partition size)
    val parts = numFiles.fold(zd.repartitionByRange(col("__z")))(
      n => zd.repartitionByRange(n, col("__z")))
    parts.sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    graft.index.ZoneMapIndex.build(df.sparkSession, path, Seq(colA, colB))
  }
}
