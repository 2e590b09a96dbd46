package graft.seqql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: any AST rendered with correct quoting/escaping parses back
  * to itself. Exercises the lexer's quoting, escaping, wildcard and
  * precedence paths far beyond the hand-written golden cases.
  * (Seeded scalacheck generators sampled directly — the
  * scalatest/scalacheck bridge artifact isn't available offline.)
  */
class ParserPropertySpec extends AnyFunSuite {

  private val fieldGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaLowerChar, Gen.oneOf('_', '.')))
      .map(_.mkString).suchThat(f => f != "_exists_" && f != "_all_" && !f.contains(".."))

  private val litCharGen: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '-', ':', '/', '\'', '"', '\\', 'я', '中', '!', '.'),
  )

  private val partsGen: Gen[Vector[Pattern.Part]] =
    Gen.nonEmptyListOf(Gen.frequency(
      5 -> Gen.nonEmptyListOf(litCharGen).map(cs => Pattern.Lit(cs.mkString): Pattern.Part),
      1 -> Gen.const(Pattern.Star: Pattern.Part),
    )).map(ps => Pattern.normalize(Pattern(ps.toVector)).parts)
      .suchThat(ps => ps.nonEmpty && !(ps.length == 1 && ps.head == Pattern.Star))

  private val patternGen: Gen[Pattern] = partsGen.map(Pattern(_))

  private def renderPattern(p: Pattern): String = {
    // single-quote everything; escape specials
    val body = p.parts.map {
      case Pattern.Star => "*"
      case Pattern.Lit(s) => s.flatMap {
        case '*'  => "\\*"
        case '\'' => "\\'"
        case '\\' => "\\\\"
        case c    => c.toString
      }
    }.mkString
    s"'$body'"
  }

  private val leafGen: Gen[SeqAst] = for {
    f <- fieldGen
    kind <- Gen.choose(0, 3)
    ast <- kind match {
      case 0 => patternGen.map(FullText(f, _))
      case 1 => Gen.nonEmptyListOf(patternGen).map(vs => InFilter(f, vs.take(4)))
      case 2 => for {
        lo <- Gen.option(Gen.choose(-1000, 1000).map(_.toString))
        hi <- Gen.option(Gen.choose(-1000, 1000).map(_.toString))
        li <- Gen.oneOf(true, false)
        hb <- Gen.oneOf(true, false)
      } yield RangeFilter(f, lo, li, hi, hb)
      case _ => Gen.const(ExistsFilter(f))
    }
  } yield ast

  private def astGen(depth: Int): Gen[SeqAst] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> Gen.zip(astGen(depth - 1), astGen(depth - 1)).map { case (l, r) => And(l, r) },
      1 -> Gen.zip(astGen(depth - 1), astGen(depth - 1)).map { case (l, r) => Or(l, r) },
      1 -> astGen(depth - 1).map(Not(_)),
    )

  private def render(ast: SeqAst): String = ast match {
    case MatchAll        => "*"
    case FullText(f, v)  => s"`$f`:${renderPattern(v)}"
    case InFilter(f, vs) => s"`$f`:in(${vs.map(renderPattern).mkString(", ")})"
    case ExistsFilter(f) => s"_exists_:`$f`"
    case RangeFilter(f, lo, li, hi, hb) =>
      val l = lo.getOrElse("*")
      val h = hi.getOrElse("*")
      s"`$f`:${if (li) "[" else "("}$l, $h${if (hb) "]" else ")"}"
    case And(l, r) => s"(${render(l)} and ${render(r)})"
    case Or(l, r)  => s"(${render(l)} or ${render(r)})"
    case Not(c)    => s"not (${render(c)})"
  }

  test("random ASTs compile to a Column or raise SeqQlError — never crash") {
    // fields are random, so most hit the unindexed-field rejection
    // (F11) — the invariant is that compilation is TOTAL over the AST
    // space: either a usable predicate or the typed error
    val mapping = graft.model.SeqMapping.of(
      "a"   -> graft.model.IndexType.Keyword,
      "a.b" -> graft.model.IndexType.Keyword,
      "t"   -> graft.model.IndexType.Text)
    val table = graft.engine.DocsTable(
      org.apache.spark.sql.SparkSession.getActiveSession
        .getOrElse(org.apache.spark.sql.SparkSession.builder()
          .master("local[2]").config("spark.ui.enabled", "false").getOrCreate())
        .createDataFrame(java.util.List.of[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("mid", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("rid", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("t__tokens",
              org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))))),
      mapping, columnOverrides = Map("a.b" -> "a"))
    val compiler = new SeqQlCompiler(table)
    var checked = 0
    var seed = 100000L
    while (checked < 300 && seed < 110000) {
      astGen(3).apply(Gen.Parameters.default, Seed(seed)) match {
        case Some(ast) =>
          checked += 1
          try compiler.compileAst(ast)
          catch {
            case _: graft.model.SeqQlError => () // typed rejection is fine
            case e: Throwable => fail(s"compile crashed for <${render(ast)}>: $e")
          }
        case None => ()
      }
      seed += 1
    }
    assert(checked == 300, s"only generated $checked samples")
  }

  test("render → parse round-trips the AST (500 seeded samples)") {
    var checked = 0
    var seed = 0L
    while (checked < 500 && seed < 5000) {
      astGen(3).apply(Gen.Parameters.default, Seed(seed)) match {
        case Some(ast) =>
          checked += 1
          val q = render(ast)
          val parsed =
            try SeqQlParser.parse(q).ast
            catch { case e: Throwable => fail(s"parse failed for <$q>: ${e.getMessage}") }
          assert(parsed == ast, s"query <$q>")
        case None => ()
      }
      seed += 1
    }
    assert(checked == 500, s"only generated $checked samples")
  }
}
