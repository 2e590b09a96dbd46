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

  /** Nested-field pseudo-doc semantics. In the reference every element
    * of a `nested` array is indexed as a separate pseudo-document that
    * shares the parent ID AND carries a copy of all the parent's tokens
    * (proxy/bulk/indexer.go:32-46 — nested metas append
    * `parent.Tokens[1:]`), while the parent's own pseudo-doc carries no
    * nested-element tokens. Search evaluates the whole boolean tree per
    * pseudo-doc (sorted-merge over per-meta posting lists), so a doc
    * matches iff SOME pseudo-doc satisfies the query. Declaratively:
    *
    *   match = Q[parent view] OR (∃ element e of P: Q[element view of P])
    *           for each nested parent P referenced by Q
    *
    * where in the parent view every nested-field leaf is `false` (the
    * parent meta has no such tokens — so a negated nested leaf is
    * vacuously true there: `not spans.op:x` alone matches every doc,
    * exactly like the reference's NAND against the full LID range), and
    * in P's element view leaves on P evaluate against that element,
    * leaves on a different nested parent are `false` (element metas of
    * P carry no tokens of P'), and plain leaves keep their doc-level
    * meaning (tokens copied to every pseudo-doc). This generalizes the
    * same-element AND rule (tests/integration_tests/single_test.go:
    * TestSearchNestedWithAND) to arbitrary boolean structure including
    * `not`.
    */
  def compileAst(ast: SeqAst): Column = {
    val parents = nestedParentsIn(ast)
    if (parents.isEmpty) compileView(ast, None)
    else {
      val views = compileView(ast, None) +: parents.toSeq.sorted.map { p =>
        exists(table.fieldCol(p), e => compileView(ast, Some((p, e))))
      }
      views.reduce(_ || _)
    }
  }

  private def leafField(ast: SeqAst): Option[String] = ast match {
    case FullText(f, _)             => Some(f)
    case InFilter(f, _)             => Some(f)
    case RangeFilter(f, _, _, _, _) => Some(f)
    case ExistsFilter(f)            => Some(f)
    case _                          => None
  }

  private def nestedParentOf(field: String): Option[String] =
    field.split("\\.").inits.drop(1)
      .map(_.mkString("."))
      .find(p => p.nonEmpty && table.mapping.isIndexed(p) &&
        table.mapping.typeOf(p) == IndexType.Nested)

  private def nestedParentsIn(ast: SeqAst): Set[String] = ast match {
    case And(l, r) => nestedParentsIn(l) ++ nestedParentsIn(r)
    case Or(l, r)  => nestedParentsIn(l) ++ nestedParentsIn(r)
    case Not(c)    => nestedParentsIn(c)
    case leaf      => leafField(leaf).flatMap(nestedParentOf).toSet
  }

  /** Compile the query as seen by one pseudo-doc: `scope = None` is the
    * parent's own pseudo-doc; `scope = Some((p, e))` is element `e` of
    * nested parent `p`. */
  private def compileView(ast: SeqAst, scope: Option[(String, Column)]): Column = ast match {
    case MatchAll   => lit(true)
    case And(l, r)  => compileView(l, scope) && compileView(r, scope)
    case Or(l, r)   => compileView(l, scope) || compileView(r, scope)
    case Not(c)     => !compileView(c, scope)
    case leaf =>
      leafField(leaf).flatMap(nestedParentOf) match {
        case Some(p) => scope match {
          case Some((sp, e)) if sp == p => compileElementFilter(p, leaf, e)
          case _                        => lit(false)
        }
        case None => leaf match {
          case FullText(f, v)  => fullText(f, v)
          case InFilter(f, vs) => vs.map(fullText(f, _)).reduce(_ || _)
          case r: RangeFilter  => range(r)
          case ExistsFilter(f) => existsFilter(f)
          case other           => lit(false) // unreachable: leaves only
        }
      }
  }

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
    if (field == "_index") return lit(false)
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
      // the reference never emits an `_exists_` token for a nested or
      // tags PARENT itself — only for element/pair child fields
      // (proxy/bulk/indexer.go decode loops `continue` before index())
      case IndexType.Nested | IndexType.Tags => lit(false)
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
    // builtin `_index` parses as a keyword field (query_parser.go:18)
    // but no `_index` token is ever emitted (ES bulk index is ignored,
    // docs/en/10-public-api.md:103-105) — it matches nothing
    if (field == "_index") return lit(false)
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
    * Token chars mirror the text tokenizer: letters, digits, `_`, and
    * LITERAL `*` (an escaped `\*` is part of a token, because the
    * tokenizer's char class includes the star). The walk is over the
    * parsed PARTS, not the rendered text — re-parsing `rawText` would
    * collapse `\*` and the wildcard `*` into the same character and
    * lose the distinction the reference's TestWildcardSymbols table
    * checks (`value\**` = token starting with the literal `value*`,
    * `value*` = token starting with `value`). */
  private def tokenizePattern(value: Pattern): Seq[Pattern] = {
    def isTokChar(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '*'
    val out = Seq.newBuilder[Pattern]
    var cur = Vector.empty[Pattern.Part]
    def addLit(s: String): Unit = if (s.nonEmpty) cur = cur :+ Pattern.Lit(s)
    def flushTok(): Unit =
      if (cur.nonEmpty) { out += Pattern.normalize(Pattern(cur)); cur = Vector.empty }
    for (part <- value.parts) part match {
      case Pattern.Star => cur = cur :+ Pattern.Star
      case Pattern.Lit(s) =>
        val sb = new StringBuilder
        for (c <- s) {
          if (isTokChar(c)) sb += c
          else { addLit(sb.toString); sb.clear(); flushTok() }
        }
        addLit(sb.toString)
    }
    flushTok()
    out.result()
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
    if (r.field == "_index") return lit(false)
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

    // text fields: ranges scan the TOKEN domain (the reference walks
    // the token dictionary, pattern/pattern.go:157-257) — a doc
    // matches when SOME token falls in the range, with the same
    // numeric-iff-both-bounds-parse duality applied per token
    if (table.mapping.typeOf(r.field) == IndexType.Text) {
      val toks = table.tokensCol(r.field)
      val loD = r.lo.map(parseDouble)
      val hiD = r.hi.map(parseDouble)
      val numeric = loD.forall(_.isDefined) && hiD.forall(_.isDefined) &&
        (loD.nonEmpty || hiD.nonEmpty)
      return exists(toks, t =>
        if (numeric) {
          val td = t.try_cast(DoubleType)
          td.isNotNull && cmp(td, loD.flatten.map(lit), hiD.flatten.map(lit))
        } else {
          val f = (s: String) => lit(if (caseSensitive) s else s.toLowerCase)
          cmp(t, r.lo.map(f), r.hi.map(f))
        })
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
