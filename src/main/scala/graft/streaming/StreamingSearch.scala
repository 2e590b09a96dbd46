package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.engine.{DocsTable, SeqEngine}
import graft.ingest.BulkIngest
import graft.model.SeqMapping

/** Live tailing search ("follow" mode): a seq-ql query applied to a
  * stream of raw JSON lines, emitting matches as they arrive.
  *
  * The reference has no push path — tailing is a client re-running
  * Search against the active fraction (docs/en/internal/fractions.md:
  * data is queryable immediately, unordered until seal). Here the SAME
  * mapping projection (BulkIngest.project) and the SAME compiled
  * seq-ql Column serve batch tables and live streams: columns resolve
  * by name, so one compiler covers both. The result is a streaming
  * DataFrame — compose it with any sink (`writeStream`, foreachBatch
  * alerting, a memory sink for tests).
  *
  * Scale: the filter is a narrow per-row predicate — no state, no
  * shuffle, no watermark; throughput is the ingest projection's. Late
  * data is re-stamped, never dropped (T2), using the stream start as
  * the drift-clamp reference; long-lived followers that care about
  * exact re-stamping should ingest via [[StreamingIngest]] (per-batch
  * wall clock) and query the table instead.
  */
object StreamingSearch {

  /** Filter a streaming DataFrame of JSON lines (string `value`
    * column) down to documents matching `query`. Fields pipes apply
    * (`... | fields a, b` projects the emitted rows).
    */
  def follow(
      lines: DataFrame,
      mapping: SeqMapping,
      query: String,
      requestTimeMs: Option[Long] = None): DataFrame = {
    val reqTime = requestTimeMs.getOrElse(System.currentTimeMillis())
    val docs = BulkIngest.project(lines, mapping, reqTime)
    val table = DocsTable(docs, mapping,
      columnOverrides = BulkIngest.aliasFields(mapping))
    val engine = new SeqEngine(table)
    val compiled = engine.compileQuery(query)
    engine.applyPipes(docs.where(compiled.filter), compiled.pipes)
  }
}
