package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max ("zone map") sidecar over numeric columns — the
  * generalization of the reference's per-fraction `From`/`To` MID
  * bounds (`fracmanager/searcher.go:89-101`, SURVEY.md §2.2 F10) to
  * ANY long-valued column, the same data-skipping idea Delta/Iceberg
  * ship. Vanilla Spark prunes parquet ROW GROUPS from pushed filters,
  * but it still opens every file's footer; at 100 TB (~10^6 files) the
  * footer round-trips alone dominate a selective lookup. This sidecar
  * keeps one (min, max) interval per (file, column) so the FILE LIST
  * is cut down driver-side before the scan is planned — and, paired
  * with a Z-order clustered layout ([[graft.ingest.ZOrder]]), several
  * columns prune at once (time partitioning gives the first axis; the
  * interleaved sort gives the rest).
  *
  * Layout: `<table>/_zonemap/` (underscore-prefixed → invisible to the
  * main-table reader), rows `(file, col, min_v, max_v)` — the long
  * format keeps one fixed schema for any column set. Nullable columns:
  * min/max ignore nulls, so a file of ONLY nulls carries a null
  * interval and never matches a bounded probe — correct, because a
  * range predicate never matches null either.
  *
  * Safety mirrors [[TokenBloomIndex]]: files the sidecar has not seen
  * (fresh appends) and columns without rows never prune, so results
  * are never missed; stale rows for compacted-away files dangle
  * harmlessly (candidates intersect the live file list).
  */
object ZoneMapIndex {

  private def sidecarPath(tablePath: String): String = s"$tablePath/_zonemap"

  /** (file, col, min_v, max_v) rows for `cols` of `df` — one
    * distributed pass over the data for all columns together.
    */
  private def zoneFrame(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"${c}__min"),
      max(col(c).cast("long")).as(s"${c}__max")))
    val agg = df.select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(perCol.head, perCol.tail: _*)
    val stacked = cols.map(c => struct(
      lit(c).as("col"),
      col(s"${c}__min").as("min_v"),
      col(s"${c}__max").as("max_v")))
    agg.select(col("file"), explode(array(stacked: _*)).as("z"))
      .select(col("file"), col("z.col"), col("z.min_v"), col("z.max_v"))
  }

  def build(spark: SparkSession, tablePath: String, cols: Seq[String]): Unit =
    zoneFrame(spark.read.parquet(tablePath), cols)
      .write.mode("overwrite").parquet(sidecarPath(tablePath))

  /** Incremental maintenance, same contract as
    * [[TokenBloomIndex.update]]: stat only files the sidecar hasn't
    * seen and append their rows. Returns the newly indexed file count.
    */
  def update(spark: SparkSession, tablePath: String, cols: Seq[String]): Int = {
    val all = spark.read.parquet(tablePath).inputFiles.toSet
    val sc = sidecarPath(tablePath)
    val known = try {
      spark.read.parquet(sc).select("file").distinct()
        .collect().map(_.getString(0)).toSet
    } catch { case _: Exception => Set.empty[String] }
    val missing = (all -- known).toSeq.sorted
    if (missing.nonEmpty) {
      val df = spark.read.option("basePath", tablePath).parquet(missing: _*)
      zoneFrame(df, cols).write.mode("append").parquet(sc)
    }
    missing.size
  }

  /** Closed-interval probes per column: `col -> (lo, hi)`, either side
    * open via None. A sidecar-covered file survives iff every probed
    * column's (min, max) interval overlaps the probe (null interval =
    * all-null file = no possible match). Files the sidecar never saw
    * always survive. Returns None when no probe can consult a sidecar
    * (read the table normally).
    *
    * The sidecar collect is O(files × cols) driver-side — at 10^6
    * files × 4 cols ≈ 50 MB of (string, long, long) rows, the same
    * order as the driver's own FileIndex listing, and it replaces
    * planning/scheduling tasks over every one of those files.
    */
  def candidateFiles(spark: SparkSession, tablePath: String,
      bounds: Map[String, (Option[Long], Option[Long])]): Option[Seq[String]] = {
    val probes = bounds.filter { case (_, (lo, hi)) => lo.isDefined || hi.isDefined }
    if (probes.isEmpty) return None
    val rows = try {
      spark.read.parquet(sidecarPath(tablePath))
        .where(col("col").isin(probes.keys.toSeq: _*))
        .select("file", "col", "min_v", "max_v").collect()
    } catch { case _: Exception => return None }
    if (rows.isEmpty) return None
    val allFiles = spark.read.parquet(tablePath).inputFiles.toSeq
    // per column: the set of files it covered, and of those the ones
    // whose interval overlaps the probe
    var indexed = Set.empty[String]
    var surviving = Set.empty[String]
    var first = true
    for ((c, (lo, hi)) <- probes) {
      val colRows = rows.filter(_.getString(1) == c)
      if (colRows.nonEmpty) {
        val covered = colRows.map(_.getString(0)).toSet
        val pass = colRows.filter { r =>
          !r.isNullAt(2) && !r.isNullAt(3) &&
            lo.forall(_ <= r.getLong(3)) && hi.forall(_ >= r.getLong(2))
        }.map(_.getString(0)).toSet
        if (first) { indexed = covered; surviving = pass; first = false }
        else { indexed = indexed intersect covered; surviving = surviving intersect pass }
      }
    }
    if (first) return None // no probed column had sidecar rows
    val unknown = allFiles.filterNot(indexed.contains)
    Some((allFiles.filter(surviving.contains) ++ unknown).sorted)
  }

  /** Read `tablePath` restricted to files whose zone intervals can
    * satisfy `bounds` (partition columns preserved via basePath).
    * Falls back to the plain read when pruning cannot apply. The
    * caller still applies the real row-level predicate — zone pruning
    * is an over-approximation, exactly like fraction time pruning.
    */
  def prunedRead(spark: SparkSession, tablePath: String,
      bounds: Map[String, (Option[Long], Option[Long])]): DataFrame =
    candidateFiles(spark, tablePath, bounds) match {
      case Some(files) if files.nonEmpty =>
        spark.read.option("basePath", tablePath).parquet(files: _*)
      case Some(_) => spark.read.parquet(tablePath).limit(0)
      case None    => spark.read.parquet(tablePath)
    }
}
