package graft.seqql

import graft.SparkSpec
import graft.engine.SeqEngine
import graft.ingest.BulkIngest
import graft.model.{FieldSpec, IndexType, SeqMapping}

/** Nested pseudo-doc semantics (proxy/bulk/indexer.go:97-105,
  * tests/integration_tests/single_test.go:165-225): an AND of filters
  * on the same nested parent must match within ONE array element.
  * Multi-type duality: `message` (text) + `message.keyword` (keyword)
  * are two indexes over one field (docs/en/03-index-types.md:130-160).
  */
class NestedSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = SeqMapping(Map(
    "svc"        -> FieldSpec("svc", Seq(IndexType.Keyword)),
    "spans"      -> FieldSpec("spans", Seq(IndexType.Nested)),
    "spans.op"   -> FieldSpec("spans.op", Seq(IndexType.Keyword)),
    "spans.ms"   -> FieldSpec("spans.ms", Seq(IndexType.Keyword)),
    "message"         -> FieldSpec("message", Seq(IndexType.Text)),
    "message.keyword" -> FieldSpec("message.keyword", Seq(IndexType.Keyword)),
  ), caseSensitive = false)

  private lazy val docs = BulkIngest.ingest(Seq(
    """{"svc":"api","spans":[{"op":"read","ms":"5"},{"op":"write","ms":"90"}],"message":"Slow Write Path"}""",
    """{"svc":"api","spans":[{"op":"read","ms":"80"},{"op":"write","ms":"3"}],"message":"fast path"}""",
    """{"svc":"db","spans":[{"op":"compact","ms":"500"}],"message":"Slow Write Path"}""",
  ).toDF("value"), mapping, 1710072000000L)

  private lazy val eng = new SeqEngine(docs)
  private def count(q: String): Long = eng.matches(q, 0, Long.MaxValue).count()

  test("single nested filter matches any element") {
    assert(count("spans.op:write") == 2)
    assert(count("spans.op:compact") == 1)
  }

  test("AND on same nested parent requires one element to satisfy both") {
    // doc1 has (write,90); doc2 has write with ms=3 and read with ms=80 —
    // element-scoped AND must match only doc1
    assert(count("spans.op:write and spans.ms:[50, *]") == 1)
    // flat-column semantics would also match doc2 (write + an 80 elsewhere)
    assert(count("spans.op:read and spans.ms:[50, *]") == 1)
  }

  test("nested AND combines with plain filters") {
    assert(count("svc:api and spans.op:write and spans.ms:[50, *]") == 1)
    assert(count("svc:db and spans.op:write and spans.ms:[50, *]") == 0)
  }

  test("nested filters under OR stay element-scoped per branch") {
    assert(count("spans.op:compact or (spans.op:write and spans.ms:[50, *])") == 2)
  }

  test("not over a nested filter matches via the parent pseudo-doc") {
    // the parent pseudo-doc never carries nested-element tokens, so a
    // bare negated nested filter is vacuously true on it — every doc
    // matches (reference: NAND against the full per-meta LID range)
    assert(count("not spans.op:compact") == 3)
    assert(count("not (spans.op:write and spans.ms:[50, *])") == 3)
    // conjoined with a plain filter, the parent view still satisfies
    // the negation — doc-level filter decides
    assert(count("svc:api and not spans.op:compact") == 2)
  }

  test("not combined with a positive nested filter is element-scoped") {
    // doc1: write@90 (fails not ms>=50); doc2: write@3 (passes) — the
    // negation applies within the SAME element as the positive filter
    assert(count("spans.op:write and not spans.ms:[50, *]") == 1)
    // op:read exists in doc1 (ms=5) and doc2 (ms=80): element-scoped
    // negation keeps doc1 only
    assert(count("spans.op:read and not spans.ms:[50, *]") == 1)
  }

  test("_exists_ on the nested parent itself matches nothing") {
    // no `_exists_:spans` token is ever emitted — only element children
    assert(count("_exists_:spans") == 0)
    assert(count("_exists_:spans.op") == 3)
  }

  test("range over a text field scans tokens, with per-token numeric duality") {
    // lexicographic: a token in [pa, pz] — "path" is in all three docs
    assert(count("message:[pa, pz]") == 3)
    // tighter range: only "fast" falls in [fa, fz]
    assert(count("message:[fa, fz]") == 1)
    // numeric bounds: no numeric tokens in these messages
    assert(count("message:[1, 99]") == 0)
  }

  test("multi-type field: text tokens vs whole-value keyword") {
    assert(count("message:slow") == 2)            // token match, folded
    assert(count("message:'write slow'") == 2)     // bag-of-words AND
    assert(count("message.keyword:'slow write path'") == 2) // whole value, folded
    assert(count("message.keyword:slow") == 0)     // keyword = whole token only
    assert(count("message.keyword:'slow write*'") == 2) // keyword wildcard
  }
}
