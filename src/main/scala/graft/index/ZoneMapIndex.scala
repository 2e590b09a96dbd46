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

  /** Driver-side sidecar cache — the analogue of the reference keeping
    * every fraction's From/To bounds in memory (fracmanager): a zone
    * probe on a warm engine must not pay a Spark job to re-read KBs of
    * stats. Keyed by table path, invalidated by the sidecar directory's
    * fingerprint (file names + sizes + mtimes), so build()/update()
    * runs — even from another process — are picked up.
    */
  private final case class ZoneRow(file: String, col: String,
    minV: Option[Long], maxV: Option[Long])
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Array[ZoneRow])]()

  private def sidecarFingerprint(path: String): String = {
    val files = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    files.sortBy(_.getName).map(f =>
      s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
  }

  /** Live data-file listing, cached by a recursive directory
    * fingerprint (underscore-prefixed sidecars/markers excluded): the
    * per-probe `spark.read...inputFiles` job is pure overhead on a
    * warm engine. Invalidation is the same contract as the sidecar
    * cache — any data file added/removed/rewritten changes the
    * fingerprint.
    */
  private val filesCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[String])]()

  private def dataFingerprint(dir: java.io.File): String = {
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
    entries.sortBy(_.getName).map { f =>
      if (f.isDirectory) s"${f.getName}/(${dataFingerprint(f)})"
      else s"${f.getName}:${f.length}:${f.lastModified}"
    }.mkString("|")
  }

  private def liveFiles(spark: SparkSession, tablePath: String): Seq[String] = {
    val fp = dataFingerprint(new java.io.File(tablePath))
    val hit = filesCache.get(tablePath)
    if (hit != null && hit._1 == fp) return hit._2
    val files = spark.read.parquet(tablePath).inputFiles.toSeq
    filesCache.put(tablePath, (fp, files))
    files
  }

  private def loadSidecar(spark: SparkSession, tablePath: String): Option[Array[ZoneRow]] = {
    val sc = sidecarPath(tablePath)
    val fp = sidecarFingerprint(sc)
    if (fp.isEmpty) return None
    val hit = cache.get(tablePath)
    if (hit != null && hit._1 == fp) return Some(hit._2)
    val rows = try {
      spark.read.parquet(sc).select("file", "col", "min_v", "max_v").collect().map { r =>
        ZoneRow(r.getString(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))
      }
    } catch { case _: Exception => return None }
    cache.put(tablePath, (fp, rows))
    Some(rows)
  }

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
    val rows = loadSidecar(spark, tablePath) match {
      case Some(rs) if rs.nonEmpty => rs
      case _ => return None
    }
    val allFiles = liveFiles(spark, tablePath)
    // per column: the set of files it covered, and of those the ones
    // whose interval overlaps the probe
    var indexed = Set.empty[String]
    var surviving = Set.empty[String]
    var first = true
    for ((c, (lo, hi)) <- probes) {
      val colRows = rows.filter(_.col == c)
      if (colRows.nonEmpty) {
        val covered = colRows.map(_.file).toSet
        val pass = colRows.filter { r =>
          r.minV.isDefined && r.maxV.isDefined &&
            lo.forall(_ <= r.maxV.get) && hi.forall(_ >= r.minV.get)
        }.map(_.file).toSet
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
