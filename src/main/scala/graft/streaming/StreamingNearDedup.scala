package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dataprep.Dedup

/** Streaming NEAR-duplicate suppression: each micro-batch is probed
  * against the persisted MinHash band index
  * ([[graft.dataprep.Dedup.buildMinhashIndex]]), survivors are handed
  * to the sink and appended to the index, near-dups of the corpus are
  * dropped (or audited). The streaming composition of
  * [[graft.dataprep.Dedup.dedupAgainstIndex]] — dedup happens before
  * storage, and the index grows with exactly the retained corpus.
  *
  * In-batch near-dups: the batch is first self-deduped with the same
  * banding (smallest id kept), so two near-identical docs arriving in
  * ONE batch don't both survive. Ordering across batches is the
  * arrival order (first batch wins), matching [[StreamingDedup]]'s
  * first-wins contract.
  *
  * Scale: per batch, the candidate probe broadcasts the (small) batch
  * band keys against the index scan; index append is one batch-sized
  * write. State lives in the index files, not in executor memory.
  *
  * Exactly-once: every write (sink, index, audit) lands under a
  * `batch=<id>` partition with mode "overwrite", so a replayed
  * micro-batch replaces its own partition instead of duplicating rows
  * — output and index stay idempotent across crash/restart. Inside the
  * index append, shingles are written before bands
  * ([[Dedup.buildMinhashIndex]]), so a mid-append crash fails closed
  * (docs unfindable until replay, never silently dropped candidates).
  * A swallowed index-append failure (logged below) leaves the batch's
  * docs in the output but not in the index — future near-dups of them
  * are not suppressed until a rebuild; that trade keeps the sink epoch
  * from failing on advisory index maintenance.
  */
object StreamingNearDedup {

  /** Start the pipeline: `docs` is a streaming frame with `idCol` and
    * `textCol`; survivors are appended as parquet at `outPath`.
    * `auditPath` (optional) receives dropped near-dups with the
    * matched corpus id.
    */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      checkpointPath: String,
      numHashes: Int = 128,
      bands: Int = 32,
      thresholdNum: Int = 1,
      thresholdDen: Int = 2,
      auditPath: Option[String] = None,
      triggerMs: Long = 1000): StreamingQuery = {
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        // tokenize + shingle the batch ONCE: self-dedup, index probe
        // and index append all run over this persisted compact form —
        // the per-document O(chars) front end used to run three times
        // per micro-batch, which at 100 TB is two wasted corpus passes
        val sh = Dedup.shingleHashes(b, idCol, textCol).persist()
        // 1. self-dedup within the batch: keep the smallest id of
        //    each near-dup pair (transitively, min of the pair graph
        //    is enough at batch sizes; exact clusters would also work).
        // selfKeptSh is persisted: dedupAgainstIndexFromShingles
        // consumes it for BOTH banding and verification (its documented
        // contract) and the keptSh join reads it a third time —
        // unpersisted, each consumption would re-run the full LSH band
        // self-join plus exact-Jaccard verification behind selfPairs,
        // per micro-batch
        val selfPairs = Dedup.minhashLshPairsFromShingles(sh,
          numHashes, bands, thresholdNum, thresholdDen)
          .select(col("id_b").as("id")).distinct()
        val selfKeptSh = sh.join(selfPairs, Seq("id"), "left_anti").persist()
        try {
          // 2. probe the corpus index. Existence goes through the
          //    Hadoop FileSystem API — java.io.File only sees the local
          //    FS, silently disabling suppression on HDFS/S3 paths —
          //    and tests the directory, not _SUCCESS (committers can be
          //    configured not to write the marker)
          val bandsDir = new org.apache.hadoop.fs.Path(s"$indexPath/bands")
          val hasIndex = bandsDir
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(bandsDir)
          val vs = if (hasIndex)
            Dedup.dedupAgainstIndexFromShingles(
              selfKeptSh.select(col("id").as("new_id"), col("sh").as("sh_new")),
              numHashes, bands, thresholdNum, thresholdDen, indexPath)
              .select(col("new_id").as(idCol), col("old_id")).persist()
          else spark.emptyDataFrame
            .withColumn(idCol, lit(0L)).withColumn("old_id", lit(0L)).limit(0)
          val dupIds = vs.select(col(idCol).as("id")).distinct()
          val keptSh = selfKeptSh.join(dupIds, Seq("id"), "left_anti").persist()
          val kept = b.join(keptSh.select(col("id").as(idCol)),
            Seq(idCol), "left_semi")
          // 3. survivors → sink + index append, each under its own
          //    batch partition (replay-idempotent, see scaladoc);
          //    advisory index failures must not fail the epoch once
          //    the sink write landed. The append reuses the batch's
          //    shingles — no retokenization of the survivor text.
          kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          try Dedup.buildMinhashIndexFromShingles(keptSh,
            numHashes, bands, indexPath,
            mode = "overwrite", partition = Some(s"batch=$batchId"))
          catch { case e: Exception =>
            System.err.println(s"[StreamingNearDedup] index append skipped: $e")
          }
          auditPath.foreach { p =>
            if (hasIndex) vs.write.mode("overwrite").parquet(s"$p/batch=$batchId")
          }
          keptSh.unpersist()
          if (hasIndex) vs.unpersist()
          ()
        } finally { b.unpersist(); sh.unpersist(); selfKeptSh.unpersist(); () }
      }
      .start()
  }
}
