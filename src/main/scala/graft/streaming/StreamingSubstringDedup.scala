package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dataprep.Dedup

/** Streaming DUPLICATE-SUBSTRING suppression — the
  * [[StreamingNearDedup]] pattern over the winnowed-fingerprint index
  * ([[graft.dataprep.Dedup.buildSubstringIndex]]): each micro-batch is
  * self-deduped (smallest id of every duplicate-substring pair kept),
  * probed against the persisted window postings, survivors land in the
  * sink and are appended to the index under their own `batch=<id>`
  * partition (replay-idempotent overwrite, same exactly-once contract
  * as [[StreamingNearDedup]]).
  *
  * Winnowing selection is content-local, so suppression detects every
  * cross-batch pair sharing a span of >= w+k-1 characters — license
  * blocks, syndicated articles, re-posted passages — regardless of
  * how far apart the batches arrive. The per-batch df sidecar keeps
  * hot boilerplate windows from fanning out the probe
  * ([[Dedup.substringDedupAgainstIndex]] re-aggregates the sidecar so
  * the cap reflects the whole index).
  *
  * Scale: the probe broadcasts the batch's selected windows (~2/(w+1)
  * of its k-grams) against the range-partitioned posting scan; state
  * lives in index files, not executor memory.
  */
object StreamingSubstringDedup {

  /** Start the pipeline: `docs` is a streaming frame with `idCol` and
    * `textCol`; survivors are appended as parquet at `outPath`;
    * `auditPath` (optional) receives dropped docs with the matched
    * corpus id and shared-window count.
    */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      checkpointPath: String,
      k: Int = 24,
      w: Int = 8,
      maxDf: Long = 0L,
      auditPath: Option[String] = None,
      triggerMs: Long = 1000): StreamingQuery = {
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        // 1. self-dedup within the batch: drop the larger id of each
        //    duplicate-substring pair. selfKept is persisted: the index
        //    probe and the kept materialization both consume it, and
        //    each unpersisted consumption would re-run the full
        //    winnowed window extraction + pair join behind selfPairs
        //    (the same shape fixed in StreamingNearDedup)
        val selfPairs = Dedup.substringDupPairsWinnowed(b, idCol, textCol, k, w, maxDf)
          .select(col("id_b").as(idCol)).distinct()
        val selfKept = b.join(selfPairs, Seq(idCol), "left_anti").persist()
        try {
          // 2. probe the corpus index (Hadoop FS existence test — see
          //    StreamingNearDedup for why not java.io.File / _SUCCESS)
          val winsDir = new org.apache.hadoop.fs.Path(s"$indexPath/wins")
          val hasIndex = winsDir
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(winsDir)
          val vs = if (hasIndex)
            Dedup.substringDedupAgainstIndex(selfKept, idCol, textCol,
              k, w, indexPath, maxDf)
              .select(col("new_id").as(idCol), col("old_id"), col("n_shared"))
              .persist()
          else spark.emptyDataFrame
            .withColumn(idCol, lit(0L)).withColumn("old_id", lit(0L))
            .withColumn("n_shared", lit(0L)).limit(0)
          val dupIds = vs.select(col(idCol)).distinct()
          val kept = selfKept.join(dupIds, Seq(idCol), "left_anti").persist()
          // 3. survivors → sink + index append, each replay-idempotent
          //    under its batch partition; advisory index failures must
          //    not fail the epoch once the sink write landed
          kept.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          try Dedup.buildSubstringIndex(kept, idCol, textCol, k, w,
            indexPath, mode = "overwrite", partition = Some(s"batch=$batchId"))
          catch { case e: Exception =>
            System.err.println(s"[StreamingSubstringDedup] index append skipped: $e")
          }
          auditPath.foreach { p =>
            if (hasIndex) vs.write.mode("overwrite").parquet(s"$p/batch=$batchId")
          }
          kept.unpersist()
          if (hasIndex) vs.unpersist()
          ()
        } finally { b.unpersist(); selfKept.unpersist(); () }
      }
      .start()
  }
}
