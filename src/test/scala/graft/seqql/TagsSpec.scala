package graft.seqql

import graft.SparkSpec
import graft.engine.SeqEngine
import graft.ingest.BulkIngest
import graft.model.{FieldSpec, IndexType, SeqMapping}

/** `tags` mapping type: an array of {key,value} pairs addressed as
  * `parent.key` (proxy/bulk/indexer.go:136-143); builtin `_all_`. */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  private val mapping = SeqMapping(Map(
    "svc"    -> FieldSpec("svc", Seq(IndexType.Keyword)),
    "labels" -> FieldSpec("labels", Seq(IndexType.Tags)),
  ), caseSensitive = false)

  private lazy val docs = BulkIngest.ingest(Seq(
    """{"svc":"api","labels":[{"key":"env","value":"Prod"},{"key":"team","value":"core"}]}""",
    """{"svc":"web","labels":[{"key":"env","value":"staging"}]}""",
    """{"svc":"db","labels":[]}""",
  ).toDF("value"), mapping, 1710072000000L)

  private lazy val eng = new SeqEngine(docs)
  private def count(q: String): Long = eng.matches(q, 0, Long.MaxValue).count()

  test("tags child equality with case folding") {
    assert(count("labels.env:prod") == 1)
    assert(count("labels.env:staging") == 1)
    assert(count("labels.team:core") == 1)
    assert(count("labels.env:dev") == 0)
  }

  test("tags child wildcard") {
    assert(count("labels.env:st*") == 1)
    assert(count("labels.env:*") == 2)
  }

  test("_exists_ on tags child") {
    assert(count("_exists_:labels.team") == 1)
    assert(count("_exists_:labels.env") == 2)
  }

  test("_all_ builtin matches everything") {
    assert(count("_all_:*") == 3)
    assert(count("_exists_:_all_") == 3)
  }

  test("_index builtin parses but matches nothing") {
    // the reference registers `_index` as a builtin keyword
    // (parser/query_parser.go:18) but never emits its token — queries
    // on it are valid and empty
    assert(count("_index:logs") == 0)
    assert(count("_index:[a, z]") == 0)
    assert(count("_exists_:_index") == 0)
    assert(count("not _index:logs") == 3)
  }
}
