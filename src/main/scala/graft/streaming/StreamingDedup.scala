package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: first occurrence of each content
  * hash wins; later duplicates are dropped as they arrive. The
  * streaming analogue of [[graft.dataprep.Dedup.exactGroups]] for a
  * training-data ingest pipeline — dedup happens before storage
  * instead of as a batch pass after it.
  *
  * State is one boolean per distinct content hash, sharded by the
  * hash itself (the groupByKey shuffle key), so state is evenly spread
  * across executors and each key holds O(1) bytes. For an unbounded
  * corpus, production would add a state TTL (EventTimeTimeout +
  * watermark) or an approximate pre-filter; the semantics here mirror
  * the reference's exact-first-wins.
  *
  * Spark's built-in `dropDuplicates` on a stream keeps state too but
  * ties eviction to a watermark COLUMN; the custom state keeps the
  * operator explicit about its memory story and lets a caller emit
  * duplicate AUDIT rows instead of silently dropping (emitDupes).
  */
object StreamingDedup {

  final case class Doc(hash: Long, id: Long, payload: String)
  final case class DedupOut(hash: Long, id: Long, payload: String, is_first: Boolean)

  def dedup(docs: Dataset[Doc], emitDupes: Boolean): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.hash)
      .flatMapGroupsWithState[Boolean, DedupOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (hash: Long, rows: Iterator[Doc], state: GroupState[Boolean]) =>
          var seen = state.getOption.getOrElse(false)
          val out = Seq.newBuilder[DedupOut]
          // within one micro-batch the smallest id is "first" so the
          // result does not depend on arrival order inside the batch
          for (d <- rows.toSeq.sortBy(_.id)) {
            if (!seen) { out += DedupOut(hash, d.id, d.payload, is_first = true); seen = true }
            else if (emitDupes) out += DedupOut(hash, d.id, d.payload, is_first = false)
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** Convenience over a raw docs stream: hash the text column. */
  def fromDocs(docs: DataFrame, idCol: String, textCol: String,
      emitDupes: Boolean = false): Dataset[DedupOut] = {
    import docs.sparkSession.implicits._
    dedup(
      docs.select(
        xxhash64(col(textCol)).as("hash"),
        col(idCol).cast("long").as("id"),
        col(textCol).as("payload")).as[Doc],
      emitDupes)
  }
}
