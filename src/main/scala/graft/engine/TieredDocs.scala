package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.SeqMapping

/** Hot/cold tiering (S8, docs/en/07-long-term-store.md): recent data
  * lives on a fast tier, history on a cheap one. The reference's proxy
  * retries cold stores when hot stores refuse old ranges
  * (proxy/search/ingestor.go:88-112); in Spark both tiers are just
  * table paths UNIONed under one DocsTable — the per-tier `mid` bounds
  * below make Catalyst prune whole tiers via their time predicates, so
  * a recent-window query never opens the cold store at all.
  */
object TieredDocs {

  /** Build a tiered docs table. `boundaryMs`: docs with mid >= boundary
    * are expected hot, older docs cold. The bound is advisory — applied
    * as a filter on each tier so overlap (e.g. during migration) never
    * duplicates results, with hot winning the boundary.
    */
  def table(
      spark: SparkSession,
      hotPath: String,
      coldPath: String,
      boundaryMs: Long,
      mapping: SeqMapping): DocsTable = {
    // mergeSchema within each tier for the same reason the serving
    // sink reader merges: a tier's files written under successive
    // mappings differ in columns, and one random footer would drop
    // the accreted fields (cross-tier drift is already handled by the
    // allowMissingColumns union)
    val hot = spark.read.option("mergeSchema", "true").parquet(hotPath)
      .where(col("mid") >= boundaryMs)
    val cold = spark.read.option("mergeSchema", "true").parquet(coldPath)
      .where(col("mid") < boundaryMs)
    DocsTable(hot.unionByName(cold, allowMissingColumns = true), mapping)
  }

  /** A tiered table with the degraded-answer contract: `partial` is
    * true when a tier could not be attached and the results therefore
    * under-approximate the full corpus — the reference's
    * ErrPartialResponse (proxy/search/ingestor.go:88-112: shard
    * failures yield partial results plus an error flag, they do not
    * fail the query). `degraded` names each unavailable tier with its
    * cause, for the response's error detail.
    */
  final case class TieredTable(
      table: DocsTable, partial: Boolean, degraded: Seq[String])

  /** [[table]] with per-tier fallback: an unreadable COLD tier (object
    * store outage, deleted prefix) degrades to hot-only + partial
    * instead of failing — recent data keeps answering, which is the
    * operational contract tiering exists for. An unreadable HOT tier
    * still fails the build: serving cold-only as if current would be
    * silently wrong in the opposite (dangerous) direction.
    */
  def tableWithFallback(
      spark: SparkSession,
      hotPath: String,
      coldPath: String,
      boundaryMs: Long,
      mapping: SeqMapping): TieredTable = {
    val hot = spark.read.option("mergeSchema", "true").parquet(hotPath)
      .where(col("mid") >= boundaryMs)
    try {
      val cold = spark.read.option("mergeSchema", "true").parquet(coldPath)
        .where(col("mid") < boundaryMs)
      TieredTable(
        DocsTable(hot.unionByName(cold, allowMissingColumns = true), mapping),
        partial = false, degraded = Nil)
    } catch {
      case e: Exception =>
        TieredTable(DocsTable(hot, mapping), partial = true,
          degraded = Seq(s"cold:$coldPath: ${e.getMessage}"))
    }
  }

  /** Migration job: move closed days older than `boundaryMs` from hot
    * to cold (rewrite day partitions, then drop them from hot).
    */
  def migrate(spark: SparkSession, hotPath: String, coldPath: String, boundaryMs: Long): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(hotPath)
    if (!fs.exists(base)) return Nil
    val cutoffDay = java.time.Instant.ofEpochMilli(boundaryMs).toString.take(10)
    val moved = fs.listStatus(base).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("date=") && p.getName.stripPrefix("date=") < cutoffDay)
    moved.foreach { p =>
      val day = p.getName
      spark.read.parquet(p.toString)
        .repartition(1).sortWithinPartitions(col("mid"), col("rid"))
        .write.mode("overwrite").parquet(s"$coldPath/$day")
      fs.delete(p, true)
    }
    moved.map(_.getName)
  }
}
