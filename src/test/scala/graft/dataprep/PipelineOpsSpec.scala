package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases for the round-3 pipeline operators: as-of join, sequence
  * packing, funnel, repetition stats, n-gram frequency, BM25.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- as-of join ----

  private lazy val trades = Seq(
    (1L, 100L, 10L), // user 1, t=100
    (1L, 50L, 11L),
    (2L, 100L, 12L), // user 2 has no quotes at all
    (3L, 5L, 13L)    // before any quote of user 3
  ).toDF("u", "t", "trade_id")

  private lazy val quotes = Seq(
    (1L, 100L, 1L, 111L), // equal-time quote (<= matches, < does not)
    (1L, 90L, 2L, 222L),
    (1L, 90L, 3L, 333L),  // same time as above — max tie id wins
    (3L, 10L, 4L, 444L)
  ).toDF("u", "t", "qid", "px")

  test("asofLatest: <= semantics, tie by largest id, unmatched → null") {
    val out = AsofJoin.asofLatest(trades, quotes, "u", "t", "t", "qid",
        Seq("px" -> "last_px"))
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // trade 10 (u1,t100): equal-time quote px=111 wins over t=90
    // trade 11 (u1,t50): no quote <= 50 → null
    // trade 12 (u2): no quotes for the user → null
    // trade 13 (u3,t5): quote at t=10 is later → null
    assert(out.toSeq == Seq((10L, 111L), (11L, -1L), (12L, -1L), (13L, -1L)))
  }

  test("asofLatest strict mode skips equal-time rows") {
    val out = AsofJoin.asofLatest(trades, quotes, "u", "t", "t", "qid",
        Seq("px" -> "last_px"), strict = true)
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // trade 10 at t=100: equal-time quote excluded → falls back to t=90,
    // where the larger qid (3, px=333) wins the tie
    assert(out.head == (10L, 333L))
  }

  test("asofLatest ties between right rows resolve to the largest tie id") {
    val lone = Seq((1L, 95L, 99L)).toDF("u", "t", "trade_id")
    val out = AsofJoin.asofLatest(lone, quotes, "u", "t", "t", "qid",
      Seq("px" -> "last_px")).collect()
    assert(out.head.getLong(3) == 333L)
  }

  test("asofLatest is partition-independent") {
    val a = AsofJoin.asofLatest(trades, quotes, "u", "t", "t", "qid",
      Seq("px" -> "last_px")).orderBy("trade_id").collect().toSeq
    val b = AsofJoin.asofLatest(trades.repartition(7), quotes.repartition(3),
      "u", "t", "t", "qid", Seq("px" -> "last_px"))
      .orderBy("trade_id").collect().toSeq
    assert(a == b)
  }

  // ---- sequence packing ----

  test("packShards: exclusive-prefix shard assignment, exact boundaries") {
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 1L), (5L, 8L))
      .toDF("id", "sz")
    val out = Packing.packShards(df, "id", "sz", budget = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // cum: 4, 8, 12, 13, 21 → excl: 0, 4, 8, 12, 13 → shard: 0,0,1,1,1
    assert(out.toSeq == Seq((1L, 4L, 0L), (2L, 8L, 0L), (3L, 12L, 1L),
      (4L, 13L, 1L), (5L, 21L, 1L)))
  }

  test("packShards matches a single-partition global window at any parallelism") {
    val n = 5000
    val df = (1 to n).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "sz")
      .repartition(16)
    val out = Packing.packShards(df, "id", "sz", budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    var cum = 0L
    val expect = (1 to n).map { i =>
      cum += (i % 7 + 1); (i.toLong, cum)
    }
    assert(out.toSeq == expect)
  }

  test("packSequences: docs split across example boundaries with exact offsets") {
    // stream: doc1 [0,3), doc2 [3,7), doc3 [7,9); seqLen 4
    val df = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 0L)).toDF("id", "sz")
    val out = Packing.packSequences(df, "id", "sz", seqLen = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 3L),               // fits example 0
      (2L, 0L, 3L, 1L), (2L, 1L, 0L, 3L), // splits across 0/1
      (3L, 1L, 3L, 1L), (3L, 2L, 0L, 1L)  // splits across 1/2
    ))
    // zero-length doc 4 emits nothing; segments of each example tile it
    val byExample = out.groupBy(_._2)
    byExample.foreach { case (_, segs) =>
      val sorted = segs.sortBy(_._3)
      sorted.foldLeft(0L) { case (off, (_, _, o, l)) =>
        assert(o == off, "segments tile the example with no gaps"); o + l
      }
    }
    // every doc's segments reassemble to its full length
    assert(out.groupBy(_._1).map { case (id, segs) => id -> segs.map(_._4).sum } ==
      Map(1L -> 3L, 2L -> 4L, 3L -> 2L))
  }

  // ---- funnel ----

  test("funnel: steps must be strictly ordered in time per user") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "view"), (2L, 10L, "click"),   // click NOT after view
      (3L, 10L, "click"), (3L, 20L, "view"),   // wrong order, no click after
      (4L, 5L, "purchase")                     // never viewed → absent
    ).toDF("u", "t", "typ")
    val out = Sessionize.funnel(ev, "u", "t", "typ",
        Seq("view", "click", "purchase"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 10L, 20L, 30L),
      (2L, 10L, -1L, -1L),
      (3L, 20L, -1L, -1L)))
  }

  // ---- repetition stats ----

  test("repetitionStats counts duplicates, top word, duplicate bigrams") {
    val df = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "")).toDF("id", "text")
    val out = TextAnalysis.repetitionStats(df, "id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // doc1: words=4 distinct=2 top=3 bigrams=3 ("a a","a a","a b") dup=1
    assert(out(0) == (1L, 4L, 2L, 3L, 3L, 1L))
    assert(out(1) == (2L, 3L, 3L, 1L, 2L, 0L))
    assert(out(2) == (3L, 0L, 0L, 0L, 0L, 0L))
  }

  test("repetitionStats kernel matches a plain-Scala reference on varied shapes") {
    // exercises the r16 one-pass kernel (RepetitionStatsExpr) against
    // an independent recomputation: repeats, unicode tokens, single
    // token, all-same, punctuation-only (tokenizes to nothing)
    val texts = Seq(
      "the the the", "a", "", "?!.,", "ünïcode ünïcode tokens",
      "a b a b a b a", "x1 x2 x3 x1 x2 x3", "solo dup dup solo solo",
      "w " * 500 + "z")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = TextAnalysis.repetitionStats(df, "id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = "[^\\p{L}\\p{N}_*]+".r.split(t.toLowerCase).filter(_.nonEmpty).toSeq
      val bi = toks.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val expect = (toks.size.toLong, toks.distinct.size.toLong,
        (if (toks.isEmpty) 0 else toks.groupBy(identity).values.map(_.size).max).toLong,
        bi.size.toLong, (bi.size - bi.distinct.size).toLong)
      assert(got(i.toLong) == expect, s"doc $i '$t'")
    }
  }

  // ---- CCNet perplexity buckets ----

  test("perplexityBuckets: equal-frequency split, predictable docs first") {
    // 6 docs; rarer vocabulary -> higher mean NLL. Common words repeat
    // across low-perplexity docs, each high-perplexity doc has unique
    // words.
    val df = Seq(
      (1L, "cat dog cat dog"), (2L, "cat dog dog cat"),
      (3L, "cat rare1"), (4L, "dog rare2"),
      (5L, "rare3 rare4"), (6L, "rare5 rare6")
    ).toDF("doc_id", "text")
    val out = CorpusStats.perplexityBuckets(df, "doc_id", "text", nBuckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    // ranks follow mean NLL ascending; buckets: ranks 1-2 -> 0, 3-4 -> 1, 5-6 -> 2
    assert(out.values.map(_._1).toSet == (1L to 6L).toSet)
    assert(out.values.count(_._2 == 0L) == 2)
    assert(out.values.count(_._2 == 1L) == 2)
    assert(out.values.count(_._2 == 2L) == 2)
    // docs of only common words sit in the head bucket
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
    // the all-rare docs sit in the tail
    assert(out(5L)._2 == 2L && out(6L)._2 == 2L)
  }

  test("perplexityBuckets: rank is a contiguous permutation at parallelism") {
    // regression for the sf0.1 rehearsal find: without pinning the LM
    // frame, withCum's two branches re-sampled independent range
    // boundaries and the stitched rank had duplicates and gaps
    val n = 4000
    val words = Seq("cat", "dog", "bird", "fish", "mouse", "horse", "crow")
    val df = (1 to n).map { i =>
      (i.toLong, (0 until 5 + i % 7).map(j => words((i * 31 + j * 17) % 7)).mkString(" "))
    }.toDF("doc_id", "text").repartition(16)
    val ranks = CorpusStats.perplexityBuckets(df, "doc_id", "text", nBuckets = 3)
      .select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (1L to n.toLong).toSeq)
  }

  // ---- Gopher rules ----

  test("gopherRules: each rule flips keep independently") {
    val goodBody = ("the data flows to the lake of streams and " * 6).trim // 54 words, all rules pass
    val df = Seq(
      (1L, goodBody),
      (2L, "the and of short"),                               // < 50 words
      (3L, (("aa " * 54).trim) + " the and"),                 // mean word length < 3
      (4L, goodBody + " " + ("# " * 10).trim),                // symbol ratio > 0.1
      (5L, ("11 22 33 44 " * 13).trim + " the and of that"),  // alpha-word ratio < 0.8
      (6L, ("lake stream data flow " * 13).trim + " rock")    // no 2 stop words
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .select("doc_id", "keep").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L))
    assert(!out(2L) && !out(3L) && !out(4L) && !out(5L) && !out(6L))
  }

  test("gopherRules: line rules count bullets and ellipses per trimmed line") {
    val body = ("the data flows to the lake of streams and " * 6).trim
    // 10 lines: 9 bullets -> exactly 90% bullets (rule requires < 90%)
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n")
    val df = Seq(
      (1L, s"$body\n$bullets"),                      // 10 lines, 9 bullets: fails rule 4
      // 1/4 bullets, 1/4 ellipsis (25% <= 30%): all rules pass
      (2L, s"$body\n- one bullet\nplain line here\n  trailing dots ..."),
      (3L, body + "\nsecond line ...\nthird ...")    // 2/3 ellipsis: fails rule 5
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(5), r.getLong(6), r.getLong(7), r.getBoolean(9)))).toMap
    assert(out(1L) == ((10L, 9L, 0L, false)))
    assert(out(2L) == ((4L, 1L, 1L, true)))
    assert(out(3L) == ((3L, 0L, 2L, false)))
  }

  // ---- n-gram frequency ----

  test("ngramFreq: multiplicity counted, deterministic tie order") {
    val df = Seq("a b a b", "a b c", "c a").toDF("text")
    val out = CorpusStats.ngramFreq(df, "text", n = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // bigrams: "a b"×3 ("a b a b" has 2: "a b","b a","a b"): a b, b a, a b / a b, b c / c a
    assert(out.toSeq == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L), ("c a", 1L)))
  }

  test("ngramFreq supports unigrams and trigrams") {
    val df = Seq("a b c d", "a b c").toDF("text")
    val uni = CorpusStats.ngramFreq(df, "text", n = 1, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(uni.toSeq == Seq(("a", 2L), ("b", 2L)))
    val tri = CorpusStats.ngramFreq(df, "text", n = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(tri.toSeq == Seq(("a b c", 2L), ("b c d", 1L)))
  }

  // ---- BM25 ----

  test("bm25Rank: rarer terms dominate, longer docs penalized, zero-score dropped") {
    val df = Seq(
      (1L, "spark spark spark common common common common"),
      (2L, "spark common"),
      (3L, "rare common"),
      (4L, "common common")
    ).toDF("id", "text")
    val out = CorpusStats.bm25Rank(df, "id", "text", Seq("spark", "rare"))
      .collect().map(_.getLong(0))
    // doc 4 has no query terms → excluded; doc 3 holds the rarest term
    assert(!out.contains(4L))
    assert(out.head == 3L)
    assert(out.toSet == Set(1L, 2L, 3L))
  }
}
