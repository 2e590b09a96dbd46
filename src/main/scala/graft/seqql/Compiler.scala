package graft.seqql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.DocsTable
import graft.model.{IndexType, SeqQlError}

/** Compiles a parsed seq-ql query into a Catalyst `Column` predicate.
  *
  * This is the whole "execution engine" of the reference re-expressed
  * declaratively: the reference lowers its AST to sorted-merge iterator
  * trees over posting lists (node/node_and.go, node/node_or.go,
  * frac/processor/eval_tree.go); here every filter becomes a Column and
  * Catalyst + Parquet do the work (predicate pushdown, dictionary/bloom
  * skipping, whole-stage codegen). Boolean simplification / negation
  * pushdown (parser/ast_node.go:39-85 propagateNot) is provided by
  * Catalyst's BooleanSimplification/NotPropagation rules.
  */
final case class CompiledQuery(filter: Column, pipes: Seq[Pipe])

final class SeqQlCompiler(table: DocsTable) {

  private def caseSensitive = table.mapping.caseSensitive

  def compile(query: String): CompiledQuery = {
    val parsed = SeqQlParser.parse(query)
    CompiledQuery(compileAst(parsed.ast), parsed.pipes)
  }

  def compileAst(ast: SeqAst): Column = ast match {
    case MatchAll            => lit(true)
    case a: And              => compileConjunction(flattenAnd(a))
    case Or(l, r)            => compileAst(l) || compileAst(r)
    case Not(c)              => !compileAst(c)
    case ExistsFilter(field) => existsFilter(field)
    case FullText(field, v)  => compileLeaf(FullText(field, v))
    case InFilter(field, vs) => compileLeaf(InFilter(field, vs))
    case r: RangeFilter      => compileLeaf(r)
  }

  private def flattenAnd(ast: SeqAst): Seq[SeqAst] = ast match {
    case And(l, r) => flattenAnd(l) ++ flattenAnd(r)
    case other     => Seq(other)
  }

  /** Nested-field pseudo-doc semantics: in the reference, each element
    * of a `nested` array is indexed as a separate pseudo-document
    * sharing the parent ID (proxy/bulk/indexer.go:97-105), so an AND of
    * filters on the same nested parent must match within ONE element
    * (tests/integration_tests/single_test.go:165-225). Here: conjuncts
    * targeting the same nested parent merge into a single `exists`
    * whose lambda ANDs the per-element predicates.
    */
  private def compileConjunction(conjuncts: Seq[SeqAst]): Column = {
    def nestedParentOf(ast: SeqAst): Option[String] = {
      val field = ast match {
        case FullText(f, _)     => Some(f)
        case InFilter(f, _)     => Some(f)
        case RangeFilter(f, _, _, _, _) => Some(f)
        case ExistsFilter(f)    => Some(f)
        case _                  => None
      }
      field.flatMap { f =>
        f.split("\\.").inits.drop(1)
          .map(_.mkString("."))
          .find(p => p.nonEmpty && table.mapping.isIndexed(p) &&
            table.mapping.typeOf(p) == IndexType.Nested)
      }
    }
    val (nested, plain) = conjuncts.partition(c => nestedParentOf(c).isDefined)
    def compilePlain(ast: SeqAst): Column = ast match {
      case FullText(f, v)  => fullText(f, v)
      case InFilter(f, vs) => vs.map(fullText(f, _)).reduce(_ || _)
      case r: RangeFilter  => range(r)
      case ExistsFilter(f) => existsFilter(f)
      case other           => compileAst(other) // Or/Not/MatchAll sub-trees
    }
    val plainCol = plain.map(compilePlain).reduceOption(_ && _)
    val nestedCols = nested.groupBy(c => nestedParentOf(c).get).toSeq.sortBy(_._1)
      .map { case (parent, filters) =>
        exists(table.fieldCol(parent), e =>
          filters.map(f => compileElementFilter(parent, f, e)).reduce(_ && _))
      }
    (plainCol.toSeq ++ nestedCols).reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Leaf outside an AND: a nested-field filter still needs element
    * scoping (a group of one). */
  private def compileLeaf(ast: SeqAst): Column = compileConjunction(Seq(ast))

  /** Compile one filter against a nested element lambda variable. */
  private def compileElementFilter(parent: String, ast: SeqAst, e: Column): Column = {
    def childCol(field: String): Column = {
      table.requireIndexed(field)
      field.stripPrefix(parent + ".").split("\\.").foldLeft(e)(_.getField(_))
    }
    ast match {
      case ExistsFilter(f) => childCol(f).isNotNull
      case FullText(f, v) =>
        val value = fold(v)
        if (value.hasWildcard) foldCol(childCol(f).cast(StringType)).like(value.toLike)
        else foldCol(childCol(f).cast(StringType)) === lit(value.exact)
      case InFilter(f, vs) =>
        vs.map(v => compileElementFilter(parent, FullText(f, v), e)).reduce(_ || _)
      case RangeFilter(f, lo, loInc, hi, hiInc) =>
        val loD = lo.map(parseDouble)
        val hiD = hi.map(parseDouble)
        val numeric = loD.forall(_.isDefined) && hiD.forall(_.isDefined)
        val c =
          if (numeric) childCol(f).try_cast(DoubleType)
          else foldCol(childCol(f).cast(StringType))
        val mk = (s: String) =>
          if (numeric) lit(parseDouble(s).get)
          else lit(if (caseSensitive) s else s.toLowerCase)
        val conds =
          lo.map(v => if (loInc) c >= mk(v) else c > mk(v)).toSeq ++
          hi.map(v => if (hiInc) c <= mk(v) else c < mk(v))
        conds.reduceOption(_ && _).map(_ && c.isNotNull).getOrElse(c.isNotNull)
      case other => compileAst(other) // non-field nodes can't appear here
    }
  }

  /** `_exists_:field` — emitted per indexed field at ingest in the
    * reference (proxy/bulk/indexer.go:128-131); columnar equivalent is
    * NULL-ness. */
  private def existsFilter(field: String): Column = {
    if (field == "_all_") return lit(true)
    tagsParentOf(field) match {
      case Some(parent) =>
        val key = field.stripPrefix(parent + ".")
        return exists(table.fieldCol(parent), e => e.getField("key") === lit(key))
      case None => ()
    }
    table.requireIndexed(field)
    if (!table.hasColumn(field)) lit(false)
    else table.mapping.typeOf(field) match {
      case IndexType.Text => size(table.tokensCol(field)) > 0
      case _              => table.fieldCol(field).isNotNull
    }
  }

  private def fold(p: Pattern): Pattern = if (caseSensitive) p else p.lowerCased

  private def foldCol(c: Column): Column = if (caseSensitive) c else lower(c)

  private def parseLong(s: String): Option[Long] =
    try Some(java.lang.Long.parseLong(s)) catch { case _: NumberFormatException => None }

  private def parseDouble(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s)) catch { case _: NumberFormatException => None }

  /** field:value term — semantics by index type (SURVEY.md §2.2). */
  private def fullText(field: String, rawValue: Pattern): Column = {
    // builtin `_all_` token is present on every doc (seq/tokenizer.go:10)
    if (field == "_all_") return lit(true)
    // `tags` children: parent is an array of {key,value} pairs; the
    // dotted child name selects pairs by key (proxy/bulk/indexer.go:136-143)
    tagsParentOf(field) match {
      case Some(parent) => return tagsMatch(parent, field, fold(rawValue))
      case None         => ()
    }
    table.requireIndexed(field)
    if (!table.hasColumn(field)) return lit(false)
    val value = fold(rawValue)
    val tpe = table.mapping.typeOf(field)
    val colDt = table.fieldType(field).get
    tpe match {
      case IndexType.Text   => textMatch(field, value)
      case IndexType.Path   => pathMatch(field, value)
      case IndexType.Exists => existsFilter(field)
      case _                => keywordMatch(field, value, colDt)
    }
  }

  private def tagsParentOf(field: String): Option[String] =
    field.split("\\.").inits.drop(1).map(_.mkString("."))
      .find(p => p.nonEmpty && table.mapping.isIndexed(p) &&
        table.mapping.typeOf(p) == IndexType.Tags)

  /** `parent.key:value` over a tags array: some pair has that key and a
    * matching value. */
  private def tagsMatch(parent: String, field: String, value: Pattern): Column = {
    val key = field.stripPrefix(parent + ".")
    val arr = table.fieldCol(parent)
    exists(arr, e => {
      val v = foldCol(e.getField("value").cast(StringType))
      e.getField("key") === lit(key) &&
        (if (value.hasWildcard) v.like(value.toLike) else v === lit(value.exact))
    })
  }

  /** keyword: whole value is one token; `*` wildcards glob over it
    * (pattern/pattern.go:34-155). Typed (numeric) columns compare
    * natively so Parquet pushdown survives. */
  private def keywordMatch(field: String, value: Pattern, dt: DataType): Column = {
    val c = table.fieldCol(field)
    dt match {
      case _: StringType =>
        if (value.hasWildcard) foldCol(c).like(value.toLike)
        else foldCol(c) === lit(value.exact)
      case LongType | IntegerType | ShortType | ByteType =>
        if (value.hasWildcard) c.cast(StringType).like(value.toLike)
        else parseLong(value.exact) match {
          case Some(l) => c === lit(l)
          case None    => parseDouble(value.exact) match {
            case Some(d) => c.cast(DoubleType) === lit(d)
            case None    => lit(false)
          }
        }
      case DoubleType | FloatType =>
        if (value.hasWildcard) c.cast(StringType).like(value.toLike)
        else parseDouble(value.exact) match {
          case Some(d) => c === lit(d)
          case None    => lit(false)
        }
      case BooleanType =>
        value.exact.toLowerCase match {
          case "true"  => c === lit(true)
          case "false" => c === lit(false)
          case _       => lit(false)
        }
      case _ =>
        if (value.hasWildcard) foldCol(c.cast(StringType)).like(value.toLike)
        else foldCol(c.cast(StringType)) === lit(value.exact)
    }
  }

  /** text: the query value is re-tokenized with the text splitter and a
    * multi-token value becomes an AND of per-token matches — phrase =
    * bag of words, no positions (parser/seqql_filter.go:240-293). */
  private def textMatch(field: String, value: Pattern): Column = {
    val toks = tokenizePattern(value)
    if (toks.isEmpty) lit(false)
    else {
      val tcol = table.tokensCol(field)
      toks.map { t =>
        if (t.hasWildcard) exists(tcol, x => x.like(t.toLike))
        else array_contains(tcol, t.exact)
      }.reduce(_ && _)
    }
  }

  /** Split a pattern on non-token separators, keeping `*` parts intact.
    * Token chars mirror the text tokenizer: letters, digits, `_`. */
  private def tokenizePattern(value: Pattern): Seq[Pattern] = {
    def isTokChar(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '*'
    val raw = value.rawText
    val runs = Seq.newBuilder[String]
    val sb = new StringBuilder
    for (c <- raw) {
      if (isTokChar(c)) sb += c
      else if (sb.nonEmpty) { runs += sb.toString; sb.clear() }
    }
    if (sb.nonEmpty) runs += sb.toString
    runs.result().map(Pattern.fromRaw)
  }

  /** path: a term matches a doc when it equals one of the doc path's
    * `/`-boundary prefixes (tokenizer/path_tokenizer.go:33-71), i.e.
    * path == term or path startswith term + "/". */
  private def pathMatch(field: String, value: Pattern): Column = {
    val c = foldCol(table.fieldCol(field))
    if (value.hasWildcard) c.like(value.toLike) || c.like(value.toLike + "/%")
    else c === lit(value.exact) || c.like(Pattern.exact(value.exact).toLike + "/%")
  }

  /** Range filter duality (pattern/pattern.go:157-257): when both given
    * bounds parse as doubles the comparison is numeric (tokens that
    * don't parse silently don't match); otherwise lexicographic. Typed
    * numeric columns always compare natively. */
  private def range(r: RangeFilter): Column = {
    table.requireIndexed(r.field)
    if (!table.hasColumn(r.field)) return lit(false)
    val c = table.fieldCol(r.field)
    val dt = table.fieldType(r.field).get

    def cmp(col: Column, loLit: Option[Column], hiLit: Option[Column]): Column = {
      val conds =
        loLit.map(l => if (r.loInclusive) col >= l else col > l).toSeq ++
        hiLit.map(h => if (r.hiInclusive) col <= h else col < h)
      if (conds.isEmpty) col.isNotNull else conds.reduce(_ && _)
    }

    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        val lo = r.lo.map(v => parseLong(v).map(lit).orElse(parseDouble(v).map(d => lit(d))).getOrElse(return lit(false)))
        val hi = r.hi.map(v => parseLong(v).map(lit).orElse(parseDouble(v).map(d => lit(d))).getOrElse(return lit(false)))
        cmp(c, lo, hi)
      case DoubleType | FloatType =>
        val lo = r.lo.map(v => parseDouble(v).map(lit).getOrElse(return lit(false)))
        val hi = r.hi.map(v => parseDouble(v).map(lit).getOrElse(return lit(false)))
        cmp(c, lo, hi)
      case _ =>
        val loD = r.lo.map(parseDouble)
        val hiD = r.hi.map(parseDouble)
        val numeric = loD.forall(_.isDefined) && hiD.forall(_.isDefined) &&
          (loD.nonEmpty || hiD.nonEmpty)
        if (numeric) {
          val cd = c.try_cast(DoubleType)
          cd.isNotNull && cmp(cd, loD.flatten.map(lit), hiD.flatten.map(lit))
        } else {
          val cf = foldCol(c)
          val f = (s: String) => lit(if (caseSensitive) s else s.toLowerCase)
          cmp(cf, r.lo.map(f), r.hi.map(f))
        }
    }
  }
}
