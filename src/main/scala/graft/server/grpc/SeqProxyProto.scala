package graft.server.grpc

import java.io.ByteArrayOutputStream

import org.sparkproject.connect.protobuf.{CodedInputStream, CodedOutputStream, WireFormat}

/** Hand-rolled wire codec for the reference's public gRPC contract
  * (api/seqproxyapi/v1/seq_proxy_api.proto) over the protobuf runtime
  * Spark ships inside spark-connect (shaded as
  * org.sparkproject.connect.protobuf — no external dependency added).
  * Field numbers and wire types mirror the proto exactly, so a client
  * generated from the reference's .proto interoperates byte-for-byte;
  * unknown fields are skipped on read (proto3 semantics).
  *
  * Messages are encoded bottom-up into byte arrays (nested messages
  * are length-delimited), which keeps the codec free of generated
  * MessageLite classes.
  */
object SeqProxyProto {

  // ---- wire helpers ------------------------------------------------

  def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val cos = CodedOutputStream.newInstance(baos)
    f(cos); cos.flush(); baos.toByteArray
  }

  private def writeMsg(out: CodedOutputStream, field: Int, body: Array[Byte]): Unit =
    if (body.nonEmpty) out.writeByteArray(field, body)
  private def writeMsgAlways(out: CodedOutputStream, field: Int, body: Array[Byte]): Unit =
    out.writeByteArray(field, body)

  private def nested[A](in: CodedInputStream)(read: CodedInputStream => A): A = {
    val bytes = in.readByteArray()
    read(CodedInputStream.newInstance(bytes))
  }

  /** proto3 `repeated double` accepts packed (LEN) and unpacked (I64). */
  private def readDoubles(in: CodedInputStream, tag: Int, acc: Vector[Double]): Vector[Double] =
    WireFormat.getTagWireType(tag) match {
      case WireFormat.WIRETYPE_LENGTH_DELIMITED =>
        val sub = CodedInputStream.newInstance(in.readByteArray())
        var v = acc
        while (!sub.isAtEnd) v :+= sub.readDouble()
        v
      case _ => acc :+ in.readDouble()
    }

  private def writePackedDoubles(out: CodedOutputStream, field: Int, vs: Seq[Double]): Unit =
    if (vs.nonEmpty) {
      out.writeTag(field, WireFormat.WIRETYPE_LENGTH_DELIMITED)
      out.writeUInt32NoTag(vs.length * 8)
      vs.foreach(out.writeDoubleNoTag)
    }

  // ---- google.protobuf.Timestamp { int64 seconds = 1; int32 nanos = 2 }

  def writeTimestampMs(ms: Long): Array[Byte] = encode { o =>
    val s = Math.floorDiv(ms, 1000L)
    val n = Math.floorMod(ms, 1000L).toInt * 1000000
    if (s != 0) o.writeInt64(1, s)
    if (n != 0) o.writeInt32(2, n)
  }

  def readTimestampMs(in: CodedInputStream): Long = {
    var s = 0L; var n = 0
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => s = in.readInt64()
        case 2 => n = in.readInt32()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    s * 1000L + n / 1000000
  }

  // ---- messages ----------------------------------------------------

  final case class SearchQuery(query: String, fromMs: Long, toMs: Long,
      explain: Boolean = false)
  /** ExplainEntry {message=1, duration=2, children=3} — the reference's
    * per-node tracing tree; here each node is a Catalyst physical-plan
    * operator (duration recorded at the root only: Spark does not
    * attribute wall time per operator without the metrics UI). */
  final case class PExplainEntry(message: String, durationMs: Long,
      children: Seq[PExplainEntry])
  final case class PSearchRequest(q: SearchQuery, size: Long, offset: Long,
      withTotal: Boolean, asc: Boolean)
  final case class Doc(id: String, data: Array[Byte], timeMs: Long)
  final case class PError(code: Int, message: String) // 1=NO, 2=PARTIAL_RESPONSE
  final case class PSearchResponse(total: Long, docs: Seq[Doc], error: PError)
  final case class PAggQuery(field: String, groupBy: String, func: Int,
      quantiles: Seq[Double], interval: String)
  final case class AggBucket(key: String, value: Double, notExists: Long,
      quantiles: Seq[Double], tsMs: Option[Long])
  final case class PAggregation(buckets: Seq[AggBucket], notExists: Long)
  final case class PGetAggregationRequest(q: SearchQuery, aggs: Seq[PAggQuery])
  final case class PGetAggregationResponse(total: Long, aggs: Seq[PAggregation], error: PError)
  final case class HistBucket(docCount: Long, tsMs: Long)
  final case class PHistogram(buckets: Seq[HistBucket])
  final case class PGetHistogramRequest(q: SearchQuery, interval: String)
  final case class PGetHistogramResponse(total: Long, hist: PHistogram, error: PError)
  /** FetchRequest.FieldsFilter (seq_proxy_api.proto:287-295): allowList
    * true keeps only `fields`, false removes them; top-level only. */
  final case class PFieldsFilter(fields: Seq[String], allowList: Boolean)
  final case class PFetchRequest(ids: Seq[String],
      fieldsFilter: Option[PFieldsFilter] = None)
  final case class PMappingResponse(data: Array[Byte])
  final case class PStatusResponse(numberOfStores: Int, oldestMs: Option[Long])
  final case class PExportRequest(q: SearchQuery, size: Long, offset: Long)
  final case class PComplexSearchRequest(q: SearchQuery, aggs: Seq[PAggQuery],
      histInterval: Option[String], size: Long, offset: Long, withTotal: Boolean, asc: Boolean)
  final case class PComplexSearchResponse(total: Long, docs: Seq[Doc],
      aggs: Seq[PAggregation], hist: Option[PHistogram], error: PError,
      explain: Option[PExplainEntry] = None)
  final case class PStartAsyncRequest(q: SearchQuery, asc: Boolean,
      aggs: Seq[PAggQuery] = Nil, histInterval: Option[String] = None,
      retentionMs: Long = 0L)
  final case class PStartAsyncResponse(searchId: String)
  final case class PFetchAsyncRequest(searchId: String, withDocs: Boolean, size: Int, offset: Int)
  final case class PFetchAsyncResponse(done: Boolean, resp: PComplexSearchResponse,
      expirationMs: Option[Long] = None)
  final case class PCancelAsyncRequest(searchId: String)

  val ErrNo = PError(1, "")

  // ---- SearchQuery {query=1, from=2, to=3} -------------------------

  def writeSearchQuery(q: SearchQuery): Array[Byte] = encode { o =>
    if (q.query.nonEmpty) o.writeString(1, q.query)
    writeMsg(o, 2, writeTimestampMs(q.fromMs))
    writeMsg(o, 3, writeTimestampMs(q.toMs))
    if (q.explain) o.writeBool(4, true)
  }

  def readSearchQuery(in: CodedInputStream): SearchQuery = {
    var query = ""; var from = 0L; var to = 0L; var explain = false
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => query = in.readStringRequireUtf8()
        case 2 => from = nested(in)(readTimestampMs)
        case 3 => to = nested(in)(readTimestampMs)
        case 4 => explain = in.readBool()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    SearchQuery(query, from, to, explain)
  }

  // ---- ExplainEntry {message=1, duration=2, children=3} (recursive)

  // google.protobuf.Duration has the same {seconds=1, nanos=2} wire
  // shape as Timestamp — the Timestamp ms codec (floorDiv/floorMod,
  // negative-safe) is reused for both.

  def writeExplainEntry(e: PExplainEntry): Array[Byte] = encode { o =>
    if (e.message.nonEmpty) o.writeString(1, e.message)
    if (e.durationMs > 0) writeMsgAlways(o, 2, writeTimestampMs(e.durationMs))
    e.children.foreach(c => writeMsgAlways(o, 3, writeExplainEntry(c)))
  }

  def readExplainEntry(in: CodedInputStream): PExplainEntry = {
    var msg = ""; var durMs = 0L
    var children = Vector.empty[PExplainEntry]
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => msg = in.readStringRequireUtf8()
        case 2 => durMs = nested(in)(readTimestampMs)
        case 3 => children :+= nested(in)(readExplainEntry)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PExplainEntry(msg, durMs, children)
  }

  // ---- SearchRequest {query=1, size=2, offset=3, with_total=4, order=5}

  def writeSearchRequest(r: PSearchRequest): Array[Byte] = encode { o =>
    writeMsg(o, 1, writeSearchQuery(r.q))
    if (r.size != 0) o.writeInt64(2, r.size)
    if (r.offset != 0) o.writeInt64(3, r.offset)
    if (r.withTotal) o.writeBool(4, true)
    if (r.asc) o.writeEnum(5, 1)
  }

  def readSearchRequest(in: CodedInputStream): PSearchRequest = {
    var q = SearchQuery("", 0, 0); var size = 0L; var off = 0L
    var wt = false; var asc = false
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => q = nested(in)(readSearchQuery)
        case 2 => size = in.readInt64()
        case 3 => off = in.readInt64()
        case 4 => wt = in.readBool()
        case 5 => asc = in.readEnum() == 1
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PSearchRequest(q, size, off, wt, asc)
  }

  // ---- Document {id=1, data=2, time=3} -----------------------------

  def writeDoc(d: Doc): Array[Byte] = encode { o =>
    if (d.id.nonEmpty) o.writeString(1, d.id)
    if (d.data.nonEmpty) o.writeByteArray(2, d.data)
    writeMsg(o, 3, writeTimestampMs(d.timeMs))
  }

  def readDoc(in: CodedInputStream): Doc = {
    var id = ""; var data = Array.empty[Byte]; var t = 0L
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => id = in.readStringRequireUtf8()
        case 2 => data = in.readByteArray()
        case 3 => t = nested(in)(readTimestampMs)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    Doc(id, data, t)
  }

  // ---- Error {code=1, message=2} -----------------------------------

  def writeError(e: PError): Array[Byte] = encode { o =>
    if (e.code != 0) o.writeEnum(1, e.code)
    if (e.message.nonEmpty) o.writeString(2, e.message)
  }

  def readError(in: CodedInputStream): PError = {
    var c = 0; var m = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => c = in.readEnum()
        case 2 => m = in.readStringRequireUtf8()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PError(c, m)
  }

  // ---- SearchResponse {total=2, docs=3, error=4} -------------------

  def writeSearchResponse(r: PSearchResponse): Array[Byte] = encode { o =>
    if (r.total != 0) o.writeInt64(2, r.total)
    r.docs.foreach(d => writeMsgAlways(o, 3, writeDoc(d)))
    writeMsg(o, 4, writeError(r.error))
  }

  def readSearchResponse(in: CodedInputStream): PSearchResponse = {
    var total = 0L; var docs = Vector.empty[Doc]; var err = PError(0, "")
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 2 => total = in.readInt64()
        case 3 => docs :+= nested(in)(readDoc)
        case 4 => err = nested(in)(readError)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PSearchResponse(total, docs, err)
  }

  // ---- AggQuery {field=1, group_by=3, func=4, quantiles=5, interval=6}

  def writeAggQuery(a: PAggQuery): Array[Byte] = encode { o =>
    if (a.field.nonEmpty) o.writeString(1, a.field)
    if (a.groupBy.nonEmpty) o.writeString(3, a.groupBy)
    if (a.func != 0) o.writeEnum(4, a.func)
    writePackedDoubles(o, 5, a.quantiles)
    if (a.interval.nonEmpty) o.writeString(6, a.interval)
  }

  def readAggQuery(in: CodedInputStream): PAggQuery = {
    var f = ""; var g = ""; var fn = 0; var qs = Vector.empty[Double]; var iv = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => f = in.readStringRequireUtf8()
        case 3 => g = in.readStringRequireUtf8()
        case 4 => fn = in.readEnum()
        case 5 => qs = readDoubles(in, tag, qs)
        case 6 => iv = in.readStringRequireUtf8()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PAggQuery(f, g, fn, qs, iv)
  }

  // ---- Aggregation.Bucket {key=2, value=3, not_exists=4, quantiles=5, ts=6}

  def writeAggBucket(b: AggBucket): Array[Byte] = encode { o =>
    if (b.key.nonEmpty) o.writeString(2, b.key)
    if (b.value != 0.0) o.writeDouble(3, b.value)
    if (b.notExists != 0) o.writeInt64(4, b.notExists)
    writePackedDoubles(o, 5, b.quantiles)
    b.tsMs.foreach(ts => writeMsgAlways(o, 6, writeTimestampMs(ts)))
  }

  def readAggBucket(in: CodedInputStream): AggBucket = {
    var k = ""; var v = 0.0; var ne = 0L; var qs = Vector.empty[Double]
    var ts: Option[Long] = None
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 2 => k = in.readStringRequireUtf8()
        case 3 => v = in.readDouble()
        case 4 => ne = in.readInt64()
        case 5 => qs = readDoubles(in, tag, qs)
        case 6 => ts = Some(nested(in)(readTimestampMs))
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    AggBucket(k, v, ne, qs, ts)
  }

  // ---- Aggregation {buckets=1, not_exists=2} -----------------------

  def writeAggregation(a: PAggregation): Array[Byte] = encode { o =>
    a.buckets.foreach(b => writeMsgAlways(o, 1, writeAggBucket(b)))
    if (a.notExists != 0) o.writeInt64(2, a.notExists)
  }

  def readAggregation(in: CodedInputStream): PAggregation = {
    var bs = Vector.empty[AggBucket]; var ne = 0L
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => bs :+= nested(in)(readAggBucket)
        case 2 => ne = in.readInt64()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PAggregation(bs, ne)
  }

  // ---- GetAggregation {query=1, aggs=2} / {total=2, aggs=3, error=4}

  def writeGetAggregationRequest(r: PGetAggregationRequest): Array[Byte] = encode { o =>
    writeMsg(o, 1, writeSearchQuery(r.q))
    r.aggs.foreach(a => writeMsgAlways(o, 2, writeAggQuery(a)))
  }

  def readGetAggregationRequest(in: CodedInputStream): PGetAggregationRequest = {
    var q = SearchQuery("", 0, 0); var aggs = Vector.empty[PAggQuery]
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => q = nested(in)(readSearchQuery)
        case 2 => aggs :+= nested(in)(readAggQuery)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PGetAggregationRequest(q, aggs)
  }

  def writeGetAggregationResponse(r: PGetAggregationResponse): Array[Byte] = encode { o =>
    if (r.total != 0) o.writeInt64(2, r.total)
    r.aggs.foreach(a => writeMsgAlways(o, 3, writeAggregation(a)))
    writeMsg(o, 4, writeError(r.error))
  }

  def readGetAggregationResponse(in: CodedInputStream): PGetAggregationResponse = {
    var total = 0L; var aggs = Vector.empty[PAggregation]; var err = PError(0, "")
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 2 => total = in.readInt64()
        case 3 => aggs :+= nested(in)(readAggregation)
        case 4 => err = nested(in)(readError)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PGetAggregationResponse(total, aggs, err)
  }

  // ---- Histogram ---------------------------------------------------

  def writeHistBucket(b: HistBucket): Array[Byte] = encode { o =>
    if (b.docCount != 0) o.writeUInt64(1, b.docCount)
    writeMsg(o, 2, writeTimestampMs(b.tsMs))
  }

  def readHistBucket(in: CodedInputStream): HistBucket = {
    var c = 0L; var ts = 0L
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => c = in.readUInt64()
        case 2 => ts = nested(in)(readTimestampMs)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    HistBucket(c, ts)
  }

  def writeHistogram(h: PHistogram): Array[Byte] = encode { o =>
    h.buckets.foreach(b => writeMsgAlways(o, 1, writeHistBucket(b)))
  }

  def readHistogram(in: CodedInputStream): PHistogram = {
    var bs = Vector.empty[HistBucket]
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => bs :+= nested(in)(readHistBucket)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PHistogram(bs)
  }

  // HistQuery {interval=1}
  def writeHistQuery(interval: String): Array[Byte] = encode { o =>
    if (interval.nonEmpty) o.writeString(1, interval)
  }
  def readHistQuery(in: CodedInputStream): String = {
    var iv = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => iv = in.readStringRequireUtf8()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    iv
  }

  def writeGetHistogramRequest(r: PGetHistogramRequest): Array[Byte] = encode { o =>
    writeMsg(o, 1, writeSearchQuery(r.q))
    writeMsg(o, 2, writeHistQuery(r.interval))
  }

  def readGetHistogramRequest(in: CodedInputStream): PGetHistogramRequest = {
    var q = SearchQuery("", 0, 0); var iv = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => q = nested(in)(readSearchQuery)
        case 2 => iv = nested(in)(readHistQuery)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PGetHistogramRequest(q, iv)
  }

  def writeGetHistogramResponse(r: PGetHistogramResponse): Array[Byte] = encode { o =>
    if (r.total != 0) o.writeInt64(2, r.total)
    writeMsgAlways(o, 3, writeHistogram(r.hist))
    writeMsg(o, 4, writeError(r.error))
  }

  def readGetHistogramResponse(in: CodedInputStream): PGetHistogramResponse = {
    var total = 0L; var h = PHistogram(Nil); var err = PError(0, "")
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 2 => total = in.readInt64()
        case 3 => h = nested(in)(readHistogram)
        case 4 => err = nested(in)(readError)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PGetHistogramResponse(total, h, err)
  }

  // ---- Fetch {ids=1, fields_filter=2 {fields=1, allow_list=2}} -----

  def writeFieldsFilter(f: PFieldsFilter): Array[Byte] = encode { o =>
    f.fields.foreach(s => o.writeString(1, s))
    if (f.allowList) o.writeBool(2, true)
  }

  def readFieldsFilter(in: CodedInputStream): PFieldsFilter = {
    var fields = Vector.empty[String]; var allow = false
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => fields :+= in.readStringRequireUtf8()
        case 2 => allow = in.readBool()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PFieldsFilter(fields, allow)
  }

  def writeFetchRequest(r: PFetchRequest): Array[Byte] = encode { o =>
    r.ids.foreach(id => o.writeString(1, id))
    r.fieldsFilter.foreach(f => writeMsgAlways(o, 2, writeFieldsFilter(f)))
  }

  def readFetchRequest(in: CodedInputStream): PFetchRequest = {
    var ids = Vector.empty[String]
    var ff: Option[PFieldsFilter] = None
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => ids :+= in.readStringRequireUtf8()
        case 2 => ff = Some(nested(in)(readFieldsFilter))
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PFetchRequest(ids, ff)
  }

  // ---- Mapping / Status --------------------------------------------

  def writeEmpty(u: Unit): Array[Byte] = Array.empty
  def readEmpty(in: CodedInputStream): Unit = {
    var tag = in.readTag()
    while (tag != 0) { in.skipField(tag); tag = in.readTag() }
  }

  def writeMappingResponse(r: PMappingResponse): Array[Byte] = encode { o =>
    if (r.data.nonEmpty) o.writeByteArray(1, r.data)
  }

  def readMappingResponse(in: CodedInputStream): PMappingResponse = {
    var d = Array.empty[Byte]
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => d = in.readByteArray()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PMappingResponse(d)
  }

  def writeStatusResponse(r: PStatusResponse): Array[Byte] = encode { o =>
    if (r.numberOfStores != 0) o.writeInt32(1, r.numberOfStores)
    r.oldestMs.foreach(ms => writeMsgAlways(o, 2, writeTimestampMs(ms)))
  }

  def readStatusResponse(in: CodedInputStream): PStatusResponse = {
    var n = 0; var oldest: Option[Long] = None
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => n = in.readInt32()
        case 2 => oldest = Some(nested(in)(readTimestampMs))
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PStatusResponse(n, oldest)
  }

  // ---- Export {query=1, size=2, offset=3} / {doc=1} ----------------

  def writeExportRequest(r: PExportRequest): Array[Byte] = encode { o =>
    writeMsg(o, 1, writeSearchQuery(r.q))
    if (r.size != 0) o.writeInt64(2, r.size)
    if (r.offset != 0) o.writeInt64(3, r.offset)
  }

  def readExportRequest(in: CodedInputStream): PExportRequest = {
    var q = SearchQuery("", 0, 0); var size = 0L; var off = 0L
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => q = nested(in)(readSearchQuery)
        case 2 => size = in.readInt64()
        case 3 => off = in.readInt64()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PExportRequest(q, size, off)
  }

  def writeExportResponse(d: Doc): Array[Byte] = encode { o =>
    writeMsgAlways(o, 1, writeDoc(d))
  }

  def readExportResponse(in: CodedInputStream): Doc = {
    var d = Doc("", Array.empty, 0L)
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => d = nested(in)(readDoc)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    d
  }

  // ---- ComplexSearch ----------------------------------------------

  def writeComplexSearchRequest(r: PComplexSearchRequest): Array[Byte] = encode { o =>
    writeMsg(o, 1, writeSearchQuery(r.q))
    r.aggs.foreach(a => writeMsgAlways(o, 2, writeAggQuery(a)))
    r.histInterval.foreach(iv => writeMsgAlways(o, 3, writeHistQuery(iv)))
    if (r.size != 0) o.writeInt64(4, r.size)
    if (r.offset != 0) o.writeInt64(5, r.offset)
    if (r.withTotal) o.writeBool(6, true)
    if (r.asc) o.writeEnum(7, 1)
  }

  def readComplexSearchRequest(in: CodedInputStream): PComplexSearchRequest = {
    var q = SearchQuery("", 0, 0); var aggs = Vector.empty[PAggQuery]
    var hist: Option[String] = None; var size = 0L; var off = 0L
    var wt = false; var asc = false
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => q = nested(in)(readSearchQuery)
        case 2 => aggs :+= nested(in)(readAggQuery)
        case 3 => hist = Some(nested(in)(readHistQuery))
        case 4 => size = in.readInt64()
        case 5 => off = in.readInt64()
        case 6 => wt = in.readBool()
        case 7 => asc = in.readEnum() == 1
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PComplexSearchRequest(q, aggs, hist, size, off, wt, asc)
  }

  def writeComplexSearchResponse(r: PComplexSearchResponse): Array[Byte] = encode { o =>
    if (r.total != 0) o.writeInt64(2, r.total)
    r.docs.foreach(d => writeMsgAlways(o, 3, writeDoc(d)))
    r.aggs.foreach(a => writeMsgAlways(o, 4, writeAggregation(a)))
    r.hist.foreach(h => writeMsgAlways(o, 5, writeHistogram(h)))
    writeMsg(o, 6, writeError(r.error))
    r.explain.foreach(e => writeMsgAlways(o, 7, writeExplainEntry(e)))
  }

  def readComplexSearchResponse(in: CodedInputStream): PComplexSearchResponse = {
    var total = 0L; var docs = Vector.empty[Doc]
    var aggs = Vector.empty[PAggregation]; var hist: Option[PHistogram] = None
    var err = PError(0, "")
    var explain: Option[PExplainEntry] = None
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 2 => total = in.readInt64()
        case 3 => docs :+= nested(in)(readDoc)
        case 4 => aggs :+= nested(in)(readAggregation)
        case 5 => hist = Some(nested(in)(readHistogram))
        case 6 => err = nested(in)(readError)
        case 7 => explain = Some(nested(in)(readExplainEntry))
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PComplexSearchResponse(total, docs, aggs, hist, err, explain)
  }

  // ---- Async -------------------------------------------------------

  // StartAsyncSearchRequest {retention=1, query=2, aggs=3, hist=4, order=5}
  def writeStartAsyncRequest(r: PStartAsyncRequest): Array[Byte] = encode { o =>
    // retention: Duration, same wire shape as Timestamp (see above)
    if (r.retentionMs > 0) writeMsgAlways(o, 1, writeTimestampMs(r.retentionMs))
    writeMsg(o, 2, writeSearchQuery(r.q))
    r.aggs.foreach(a => writeMsgAlways(o, 3, writeAggQuery(a)))
    r.histInterval.foreach(iv =>
      writeMsgAlways(o, 4, encode(h => if (iv.nonEmpty) h.writeString(1, iv))))
    if (r.asc) o.writeEnum(5, 1)
  }

  def readStartAsyncRequest(in: CodedInputStream): PStartAsyncRequest = {
    var q = SearchQuery("", 0, 0); var asc = false
    var aggs = Vector.empty[PAggQuery]
    var hist: Option[String] = None
    var retentionMs = 0L
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => retentionMs = nested(in)(readTimestampMs)
        case 2 => q = nested(in)(readSearchQuery)
        case 3 => aggs :+= nested(in)(readAggQuery)
        case 4 => hist = Some(nested(in) { h => // HistQuery {interval=1}
          var iv = ""
          var t = h.readTag()
          while (t != 0) {
            if (WireFormat.getTagFieldNumber(t) == 1) iv = h.readStringRequireUtf8()
            else h.skipField(t)
            t = h.readTag()
          }
          iv
        })
        case 5 => asc = in.readEnum() == 1
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PStartAsyncRequest(q, asc, aggs, hist, retentionMs)
  }

  def writeStartAsyncResponse(r: PStartAsyncResponse): Array[Byte] = encode { o =>
    if (r.searchId.nonEmpty) o.writeString(1, r.searchId)
  }

  def readStartAsyncResponse(in: CodedInputStream): PStartAsyncResponse = {
    var id = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => id = in.readStringRequireUtf8()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PStartAsyncResponse(id)
  }

  // FetchAsyncSearchResultRequest {search_id=1, with_docs=2, size=3, offset=4}
  def writeFetchAsyncRequest(r: PFetchAsyncRequest): Array[Byte] = encode { o =>
    if (r.searchId.nonEmpty) o.writeString(1, r.searchId)
    if (r.withDocs) o.writeBool(2, true)
    if (r.size != 0) o.writeInt32(3, r.size)
    if (r.offset != 0) o.writeInt32(4, r.offset)
  }

  def readFetchAsyncRequest(in: CodedInputStream): PFetchAsyncRequest = {
    var id = ""; var wd = false; var size = 0; var off = 0
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => id = in.readStringRequireUtf8()
        case 2 => wd = in.readBool()
        case 3 => size = in.readInt32()
        case 4 => off = in.readInt32()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PFetchAsyncRequest(id, wd, size, off)
  }

  // FetchAsyncSearchResultResponse {done=1, expiration=2, response=3}
  def writeFetchAsyncResponse(r: PFetchAsyncResponse): Array[Byte] = encode { o =>
    if (r.done) o.writeBool(1, true)
    r.expirationMs.foreach(ms => writeMsgAlways(o, 2, writeTimestampMs(ms)))
    writeMsgAlways(o, 3, writeComplexSearchResponse(r.resp))
  }

  def readFetchAsyncResponse(in: CodedInputStream): PFetchAsyncResponse = {
    var done = false; var resp = PComplexSearchResponse(0, Nil, Nil, None, PError(0, ""))
    var exp: Option[Long] = None
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => done = in.readBool()
        case 2 => exp = Some(nested(in)(readTimestampMs))
        case 3 => resp = nested(in)(readComplexSearchResponse)
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PFetchAsyncResponse(done, resp, exp)
  }

  // CancelAsyncSearchRequest {search_id=1} / empty response
  def writeCancelAsyncRequest(r: PCancelAsyncRequest): Array[Byte] = encode { o =>
    if (r.searchId.nonEmpty) o.writeString(1, r.searchId)
  }

  def readCancelAsyncRequest(in: CodedInputStream): PCancelAsyncRequest = {
    var id = ""
    var tag = in.readTag()
    while (tag != 0) {
      WireFormat.getTagFieldNumber(tag) match {
        case 1 => id = in.readStringRequireUtf8()
        case _ => in.skipField(tag)
      }
      tag = in.readTag()
    }
    PCancelAsyncRequest(id)
  }
}
