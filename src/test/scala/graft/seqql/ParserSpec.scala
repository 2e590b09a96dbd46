package graft.seqql

import org.scalatest.funsuite.AnyFunSuite
import graft.model.SeqQlError

class ParserSpec extends AnyFunSuite {
  private def p(q: String): SeqQuery = SeqQlParser.parse(q)

  test("keyword filter") {
    assert(p("level:error").ast == FullText("level", Pattern.exact("error")))
  }

  test("and binds tighter than or") {
    val q = p("a:1 or b:2 and c:3").ast
    assert(q == Or(FullText("a", Pattern.exact("1")),
      And(FullText("b", Pattern.exact("2")), FullText("c", Pattern.exact("3")))))
  }

  test("not is unary prefix; double negation preserved in AST") {
    assert(p("not not a:1").ast == Not(Not(FullText("a", Pattern.exact("1")))))
  }

  test("parens override precedence") {
    val q = p("(a:1 or b:2) and c:3").ast
    assert(q == And(Or(FullText("a", Pattern.exact("1")), FullText("b", Pattern.exact("2"))),
      FullText("c", Pattern.exact("3"))))
  }

  test("wildcard patterns") {
    val FullText(_, v) = p("svc:api-*-prod").ast: @unchecked
    assert(v.parts == Vector(Pattern.Lit("api-"), Pattern.Star, Pattern.Lit("-prod")))
    assert(v.toLike == "api-%-prod")
  }

  test("quoted literals with escapes") {
    val FullText(f, v) = p("""msg:'it\'s A \*star\* here'""").ast: @unchecked
    assert(f == "msg")
    assert(v.exact == "it's A *star* here")
    assert(!v.hasWildcard)
  }

  test("double quotes allow single quotes; backticks are raw") {
    val FullText(_, v1) = p("""k:"it's fine"""").ast: @unchecked
    assert(v1.exact == "it's fine")
    val FullText(_, v2) = p("k:`\\n*`").ast: @unchecked
    assert(v2.exact == "\\n*" && !v2.hasWildcard) // backtick: no escapes, literal star
  }

  test("unescaped star in quotes is a wildcard") {
    val FullText(_, v) = p("k:'pre*post'").ast: @unchecked
    assert(v.hasWildcard)
  }

  test("in() list with mixed quoting") {
    val InFilter(f, vs) = p("ns:in(default, 'kube system', web-*)").ast: @unchecked
    assert(f == "ns")
    assert(vs.map(_.rawText) == Seq("default", "kube system", "web-*"))
    assert(vs(2).hasWildcard)
  }

  test("ranges: brackets, comma and 'to', star bounds") {
    assert(p("b:[100, 200)").ast == RangeFilter("b", Some("100"), true, Some("200"), false))
    assert(p("b:(1.5 to 2.5]").ast == RangeFilter("b", Some("1.5"), false, Some("2.5"), true))
    assert(p("b:[*, 10]").ast == RangeFilter("b", None, true, Some("10"), true))
    assert(p("b:[5, *]").ast == RangeFilter("b", Some("5"), true, None, true))
  }

  test("_exists_ filter") {
    assert(p("_exists_:user.id").ast == ExistsFilter("user.id"))
  }

  test("match-all and empty query") {
    assert(p("*").ast == MatchAll)
    assert(p("").ast == MatchAll)
    assert(p("   ").ast == MatchAll)
  }

  test("fields pipe, keep and except") {
    assert(p("a:1 | fields x, y").pipes == Seq(FieldsPipe(Seq("x", "y"), except = false)))
    assert(p("* | fields except payload").pipes == Seq(FieldsPipe(Seq("payload"), except = true)))
  }

  test("keywords are case-insensitive") {
    assert(p("a:1 AND b:2 OR NOT c:3").ast ==
      Or(And(FullText("a", Pattern.exact("1")), FullText("b", Pattern.exact("2"))),
        Not(FullText("c", Pattern.exact("3")))))
  }

  test("field names may be quoted") {
    assert(p("`key with space`:v").ast == FullText("key with space", Pattern.exact("v")))
  }

  test("errors: unbalanced paren, bad pipe, second fields pipe, trailing junk") {
    assertThrows[SeqQlError](p("(a:1"))
    assertThrows[SeqQlError](p("a:1 | stats count"))
    assertThrows[SeqQlError](p("a:1 | fields x | fields y"))
    assertThrows[SeqQlError](p("a:1 )"))
  }

  test("unicode and byte escapes") {
    val FullText(_, v) = p("""k:'зн\x41'""").ast: @unchecked
    assert(v.exact == "знA")
  }

  test("adjacent and duplicate stars collapse") {
    val FullText(_, v) = p("k:**a**b**").ast: @unchecked
    assert(v.parts == Vector(Pattern.Star, Pattern.Lit("a"), Pattern.Star,
      Pattern.Lit("b"), Pattern.Star))
  }

  test("numeric-looking fields and values are plain terms") {
    assert(p("404:500").ast == FullText("404", Pattern.exact("500")))
  }

  test("values may contain colons and dashes (trace ids, URLs)") {
    val FullText(f, v) = p("trace:123e4567-e89b-12d3").ast: @unchecked
    assert(f == "trace" && v.exact == "123e4567-e89b-12d3")
    val FullText(_, v2) = p("url:'http://x/y?z=1'").ast: @unchecked
    assert(v2.exact == "http://x/y?z=1")
  }

  test("deeply mixed precedence round trip") {
    val q = p("a:1 and not b:2 or c:in(x, y) and d:[1, 2)").ast
    assert(q == Or(
      And(FullText("a", Pattern.exact("1")), Not(FullText("b", Pattern.exact("2")))),
      And(InFilter("c", Seq(Pattern.exact("x"), Pattern.exact("y"))),
        RangeFilter("d", Some("1"), true, Some("2"), false))))
  }

  test("pipe after complex expression, whitespace-insensitive") {
    val q = p("  a:1   or(b:2 and c:3)|fields  x ,y  ")
    assert(q.pipes == Seq(FieldsPipe(Seq("x", "y"), except = false)))
  }

  test("range with 'to' separator and negative numbers") {
    assert(p("delta:[-5 to -1]").ast ==
      RangeFilter("delta", Some("-5"), true, Some("-1"), true))
  }

  test("in() requires parenthesized non-empty list") {
    assertThrows[SeqQlError](p("a:in()"))
    // `in` not followed by ( is a plain term
    assert(p("a:in").ast == FullText("a", Pattern.exact("in")))
  }
}
