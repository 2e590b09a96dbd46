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

  test("in() requires parenthesized non-empty list") {
    assertThrows[SeqQlError](p("a:in()"))
    // `in` not followed by ( is a plain term
    assert(p("a:in").ast == FullText("a", Pattern.exact("in")))
  }
}
