package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dataprep.Dedup

/** Streaming duplicate-span REMOVAL — the rewrite counterpart of
  * [[StreamingSubstringDedup]] (which drops whole documents). Each
  * micro-batch is first rewritten against the persisted full-window
  * removal index ([[graft.dataprep.Dedup.buildRemovalIndex]]: history
  * is canonical, incoming spans already published are excised), then
  * self-rewritten within the batch (id-ordered first-occurrence keeps
  * the span), and the CLEANED text lands in the sink — so what the
  * index accretes, under its replay-idempotent `batch=<id>` partition,
  * is exactly what was published. Duplicated spans therefore keep ONE
  * surviving occurrence across the entire stream history, the Lee et
  * al. contract applied continuously.
  *
  * Scale: the index is the O(corpus chars) full-window set (see
  * [[graft.dataprep.Dedup.removeSpansAgainstIndex]] — winnowing cannot
  * serve removal); the probe is a semi-join per batch against the
  * range-partitioned window files, state lives on disk, not executor
  * memory.
  */
object StreamingSpanRemoval {

  /** Start the pipeline: `docs` is a streaming frame with `idCol` and
    * `textCol`; rewritten docs (idCol, n_chars, n_removed, clean_text)
    * are appended as parquet at `outPath/batch=<id>`.
    */
  def start(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      checkpointPath: String,
      k: Int = 24,
      triggerMs: Long = 1000): StreamingQuery = {
    docs.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val b = batch.persist()
        // frames persisted mid-batch, released in the finally so a
        // throwing epoch can't strand cache blocks for the session
        var pinned: List[DataFrame] = Nil
        try {
          val winsDir = new org.apache.hadoop.fs.Path(s"$indexPath/allwins")
          val hasIndex = winsDir
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(winsDir)
          // 1. history precedence: excise spans already published.
          //    Deliberately NOT persisted although removeDuplicateSpans
          //    consumes it three times (owner agg, positioned windows,
          //    excise join-back): all three consumptions live in ONE
          //    physical plan, where the probe join's identical shuffle
          //    subtrees are deduplicated by exchange reuse — measured
          //    at sf0.1, a persist here is a pure materialization
          //    barrier on rewritten text and costs ~15% wall time
          // excludeBatch = this epoch's own partition: on crash-replay
          // the previous execution of THIS batchId already appended its
          // windows under allwins/batch=<id>; probing them would excise
          // the replayed text against itself (see
          // [[Dedup.removeSpansAgainstIndex]]) and break the
          // replay-idempotence contract this sink's layout exists for
          val vsIndex =
            if (hasIndex)
              Dedup.removeSpansAgainstIndex(b, idCol, textCol, k, indexPath,
                excludeBatch = Some(batchId.toString))
                .select(col(idCol), col("clean_text"))
            else b.select(col(idCol), col(textCol).as("clean_text"))
          // 2. batch-internal first-occurrence rewrite on the survivor text
          val selfClean = Dedup
            .removeDuplicateSpans(vsIndex, idCol, "clean_text", k)
            .select(col(idCol), col("clean_text"))
          // counts reported against the ORIGINAL text, not stage inputs
          val out = b
            .select(col(idCol), length(col(textCol)).cast("long").as("n_chars"))
            .join(selfClean, Seq(idCol))
            .withColumn("n_removed",
              (col("n_chars") - length(col("clean_text"))).cast("long"))
            .select(col(idCol), col("n_chars"), col("n_removed"), col("clean_text"))
            .persist()
          pinned ::= out
          // 3. published text → sink + index append, each
          //    replay-idempotent under its batch partition; advisory
          //    index failures must not fail the epoch once the sink
          //    write landed (same contract as StreamingSubstringDedup)
          out.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
          try Dedup.buildRemovalIndex(out, idCol, "clean_text", k,
            indexPath, mode = "overwrite", partition = Some(s"batch=$batchId"))
          catch { case e: Exception =>
            System.err.println(s"[StreamingSpanRemoval] index append skipped: $e")
          }
          ()
        } finally { b.unpersist(); pinned.foreach(_.unpersist()); () }
      }
      .start()
  }
}
