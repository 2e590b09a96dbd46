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
  * write. State lives in the index files, not in executor memory —
  * restart recovery comes from checkpointing plus the idempotent
  * probe (a replayed batch's survivors are already in the index and
  * drop out via the id inequality... they would match themselves:
  * the probe EXCLUDES identical ids, so a replayed doc survives the
  * probe but its re-append is the same (id, bands) rows — harmless
  * for matching, double-counted only in storage; compaction dedups).
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
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        try {
          // 1. self-dedup within the batch: keep the smallest id of
          //    each near-dup pair (transitively, min of the pair graph
          //    is enough at batch sizes; exact clusters would also work)
          val selfPairs = Dedup.minhashLshPairs(b, idCol, textCol,
            numHashes, bands, thresholdNum, thresholdDen)
            .select(col("id_b").as(idCol)).distinct()
          val selfKept = b.join(selfPairs, Seq(idCol), "left_anti")
          // 2. probe the corpus index
          val hasIndex = new java.io.File(s"$indexPath/bands/_SUCCESS").exists()
          val vs = if (hasIndex)
            Dedup.dedupAgainstIndex(selfKept, idCol, textCol,
              numHashes, bands, thresholdNum, thresholdDen, indexPath)
              .select(col("new_id").as(idCol), col("old_id")).persist()
          else spark.emptyDataFrame
            .withColumn(idCol, lit(0L)).withColumn("old_id", lit(0L)).limit(0)
          val dupIds = vs.select(col(idCol)).distinct()
          val kept = selfKept.join(dupIds, Seq(idCol), "left_anti").persist()
          // 3. survivors → sink + index append (advisory failures must
          //    not fail the epoch once the sink append landed)
          kept.write.mode("append").parquet(outPath)
          try Dedup.buildMinhashIndex(kept, idCol, textCol,
            numHashes, bands, indexPath, mode = "append")
          catch { case e: Exception =>
            System.err.println(s"[StreamingNearDedup] index append skipped: $e")
          }
          auditPath.foreach { p =>
            if (hasIndex) vs.write.mode("append").parquet(p)
          }
          kept.unpersist()
          if (hasIndex) vs.unpersist()
          ()
        } finally b.unpersist()
      }
      .start()
  }
}
