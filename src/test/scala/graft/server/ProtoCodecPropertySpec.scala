package graft.server

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.sparkproject.connect.protobuf.CodedInputStream

import graft.server.grpc.SeqProxyProto._

/** Property: every hand-rolled message codec round-trips arbitrary
  * values — strings with quotes/unicode/empties, negative epochs,
  * extreme longs, empty and long repeated fields. The generated-stub
  * equivalence we can't link offline is approximated by hammering the
  * wire paths (varint boundaries, packed repeated, nested
  * length-delimited) with seeded generators.
  */
class ProtoCodecPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def rt[A](w: A => Array[Byte], r: CodedInputStream => A, v: A): A =
    r(CodedInputStream.newInstance(w(v)))

  private val strGen: Gen[String] = Gen.frequency(
    6 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '"', '\\', ':', 'я', '中', '\n'))).map(_.mkString),
    1 -> Gen.const(""),
  )
  private val msGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(-62135596800000L, 253402300799999L), // proto Timestamp domain
    Gen.oneOf(0L, -1L, 999L, -999L, 1000L, -1000L, 1710072000123L))
  private val longGen: Gen[Long] = Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
  private val doublesGen: Gen[Seq[Double]] =
    Gen.listOf(Gen.chooseNum(-1e9, 1e9)).map(_.toSeq)

  test("Timestamp ms round-trips across the full domain") {
    sample(msGen, 300).foreach(ms =>
      assert(rt((x: Long) => writeTimestampMs(x), readTimestampMs, ms) == ms))
  }

  test("SearchQuery / SearchRequest round-trip") {
    val g = for {
      q <- strGen; f <- msGen; t <- msGen
      size <- longGen; off <- longGen; wt <- Gen.oneOf(true, false); asc <- Gen.oneOf(true, false)
    } yield PSearchRequest(SearchQuery(q, f, t), size, off, wt, asc)
    sample(g, 200).foreach(v => assert(rt(writeSearchRequest, readSearchRequest, v) == v))
  }

  test("AggQuery / AggBucket / Aggregation round-trip (packed doubles)") {
    val bucketGen = for {
      k <- strGen; v <- Gen.chooseNum(-1e12, 1e12); ne <- longGen
      qs <- doublesGen; ts <- Gen.option(msGen)
    } yield AggBucket(k, v, ne, qs, ts)
    val aggGen = for {
      bs <- Gen.listOf(bucketGen); ne <- longGen
    } yield PAggregation(bs.toSeq, ne)
    sample(aggGen, 150).foreach(v => assert(rt(writeAggregation, readAggregation, v) == v))
    val aqGen = for {
      f <- strGen; g0 <- strGen; fn <- Gen.chooseNum(0, 6); qs <- doublesGen; iv <- strGen
    } yield PAggQuery(f, g0, fn, qs, iv)
    sample(aqGen, 150).foreach(v => assert(rt(writeAggQuery, readAggQuery, v) == v))
  }

  test("FetchRequest with fields_filter round-trips") {
    val filterGen: Gen[Option[PFieldsFilter]] = Gen.option(
      for {
        fs <- Gen.listOf(strGen)
        allow <- Gen.oneOf(true, false)
      } yield PFieldsFilter(fs.toSeq, allow))
    val reqGen: Gen[PFetchRequest] = for {
      ids <- Gen.listOf(strGen)
      ff <- filterGen
    } yield PFetchRequest(ids.toSeq, ff)
    sample(reqGen, 200).foreach { r =>
      val got = rt(writeFetchRequest, readFetchRequest, r)
      // message fields carry presence in proto3: an all-default filter
      // (no fields, allow=false) is zero body bytes, but the field tag
      // is still written (writeMsgAlways), so Some(default) != None
      assert(got == r, s"$r -> $got")
    }
  }

  test("ComplexSearchRequest/Response and async messages round-trip") {
    val docGen = for {
      id <- strGen; data <- Gen.listOf(Gen.chooseNum(-128, 127)).map(_.map(_.toByte).toArray)
      t <- msGen
    } yield Doc(id, data, t)
    val respGen = for {
      total <- longGen; docs <- Gen.listOf(docGen)
      hist <- Gen.option(Gen.listOf(
        for { c <- Gen.chooseNum(0L, Long.MaxValue / 2); ts <- msGen } yield HistBucket(c, ts))
        .map(bs => PHistogram(bs.toSeq)))
      code <- Gen.chooseNum(0, 3); msg <- strGen
    } yield PComplexSearchResponse(total, docs.toSeq, Nil, hist, PError(code, msg))
    sample(respGen, 100).foreach { v =>
      val got = rt(writeComplexSearchResponse, readComplexSearchResponse, v)
      // Doc.data is Array — compare structurally
      assert(got.total == v.total && got.hist == v.hist && got.error == v.error)
      assert(got.docs.size == v.docs.size)
      got.docs.zip(v.docs).foreach { case (a, b) =>
        assert(a.id == b.id && a.timeMs == b.timeMs && a.data.sameElements(b.data))
      }
    }
    val farGen = for {
      done <- Gen.oneOf(true, false); id <- strGen
      wd <- Gen.oneOf(true, false); s <- Gen.chooseNum(0, 1000); o <- Gen.chooseNum(0, 1000)
    } yield (PFetchAsyncRequest(id, wd, s, o), done)
    sample(farGen, 100).foreach { case (req, _) =>
      assert(rt(writeFetchAsyncRequest, readFetchAsyncRequest, req) == req)
    }
  }
}
