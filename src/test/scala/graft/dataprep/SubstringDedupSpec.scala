package graft.dataprep

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Duplicate-substring detection: the exact k-window operator and its
  * winnowed-fingerprint scale path (Schleimer et al., SIGMOD 2003).
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while rain falls"
  private val boiler = "COMMON LICENSE HEADER TEXT BLOCK FOR EVERY FILE"

  // 1,2 share a long planted span; 3 is unrelated; 4,5,6 share only
  // the boilerplate block (high-DF window mass).
  private def corpus = Seq(
    (1L, s"alpha $base omega unrelated tail one"),
    (2L, s"zeta prefix $base closing remarks two"),
    (3L, "completely different content with no overlap at all here xyz"),
    // bodies diverge at the first post-boiler character, so every
    // shared window among 4,5,6 lies fully inside the boilerplate
    (4L, s"$boiler Wgardening rakes and soil beds"),
    (5L, s"$boiler Xastronomy scopes and star maps"),
    (6L, s"$boiler Ysailing knots and tide charts")
  ).toDF("doc_id", "text")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact pairs: shared k-window detected, disjoint docs absent") {
    val p = Dedup.substringDupPairs(corpus, "doc_id", "text", k = 24)
    val s = pairSet(p)
    assert(s.contains((1L, 2L)))
    assert(!s.exists(t => t._1 == 3L || t._2 == 3L))
    // boilerplate trio pairs present without a DF cap
    assert(s.contains((4L, 5L)) && s.contains((4L, 6L)) && s.contains((5L, 6L)))
  }

  test("maxDf cap removes pairs whose only evidence is high-DF windows") {
    val p = Dedup.substringDupPairs(corpus, "doc_id", "text", k = 24, maxDf = 2L)
    val s = pairSet(p)
    assert(s.contains((1L, 2L)))
    assert(!s.contains((4L, 5L)) && !s.contains((4L, 6L)) && !s.contains((5L, 6L)))
  }

  test("n_shared counts distinct shared windows exactly") {
    // two docs sharing exactly one 8-char window ("ABCDEFGH")
    val df = Seq((1L, "xxABCDEFGHyy"), (2L, "qqABCDEFGHrr")).toDF("doc_id", "text")
    val rows = Dedup.substringDupPairs(df, "doc_id", "text", k = 8).collect()
    assert(rows.toSeq == Seq(Row(1L, 2L, 1L)))
  }

  test("winnowing guarantee: every pair sharing >= w+k-1 chars is found") {
    val k = 24; val w = 8
    // planted span of exactly w+k-1 = 31 chars shared by 10,11
    val span = "SHARED-SPAN-0123456789-ABCDEFGH" // 31 chars
    assert(span.length == w + k - 1)
    val df = Seq(
      (10L, s"left padding text $span right padding text"),
      (11L, s"другой prefix $span different suffix entirely"),
      (12L, "no shared content here at all just filler words")
    ).toDF("doc_id", "text")
    val winnowed = pairSet(Dedup.substringDupPairsWinnowed(df, "doc_id", "text", k, w))
    assert(winnowed.contains((10L, 11L)))
    assert(!winnowed.exists(t => t._1 == 12L || t._2 == 12L))
  }

  test("winnowed pairs are a subset of exact pairs, with n_shared a lower bound") {
    val k = 16; val w = 4
    val exact = Dedup.substringDupPairs(corpus, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val win = Dedup.substringDupPairsWinnowed(corpus, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(win.keySet.subsetOf(exact.keySet))
    win.foreach { case (pair, n) => assert(n <= exact(pair)) }
    assert(win.nonEmpty)
  }

  test("repeated spans never yield duplicate windows or self-pairs") {
    // heavily self-repetitive text: the same k-gram is selected at
    // many positions — output must still be one (id, win) row each,
    // and the pair algebra must never emit (a, a)
    val df = Seq(
      (1L, "abcdefghij" * 30),
      (2L, "abcdefghij" * 25 + " trailer content here")
    ).toDF("doc_id", "text")
    val wins = Dedup.winnowedWindows(df, "doc_id", "text", k = 24, w = 8)
    assert(wins.count() == wins.distinct().count())
    val pairs = Dedup.substringDupPairsWinnowed(df, "doc_id", "text", k = 24, w = 8)
      .collect()
    assert(pairs.forall(r => r.getLong(0) != r.getLong(1)))
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("winnowing selects ~2/(w+1) of windows (compression really happens)") {
    val k = 16; val w = 8
    val docs = graft.tables.TestTables.documents(spark, sfDir)
    val all = docs.where(length(col("text")) >= k + w - 1)
      .select((length(col("text")) - (k - 1)).as("n")).agg(sum("n")).head.getLong(0)
    val sel = Dedup.winnowedWindows(docs, "doc_id", "text", k, w).count()
    assert(sel < all / 2, s"selected $sel of $all windows — winnowing not compressing")
    assert(sel > 0)
  }

  test("incremental index: batch-vs-index pairs equal the full run's cross pairs") {
    val k = 16; val w = 4
    val dir = java.nio.file.Files.createTempDirectory("graft_ssidx").toString
    val old = corpus.where($"doc_id" <= 4L)
    val batch = corpus.where($"doc_id" > 4L)
    Dedup.buildSubstringIndex(old, "doc_id", "text", k, w, dir)
    val incr = Dedup.substringDedupAgainstIndex(batch, "doc_id", "text", k, w, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // full winnowed run, restricted to (new, old) cross pairs
    val full = Dedup.substringDupPairsWinnowed(corpus, "doc_id", "text", k, w)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .collect { case ((a, b), n) if a <= 4L && b > 4L => (b, a) -> n }
      .toMap
    assert(incr == full && incr.nonEmpty)
  }

  test("incremental index df cap: hot windows drop at the sidecar") {
    val k = 16; val w = 4
    val dir = java.nio.file.Files.createTempDirectory("graft_ssidx_cap").toString
    Dedup.buildSubstringIndex(corpus.where($"doc_id" =!= 1L), "doc_id", "text", k, w, dir)
    val uncapped = Dedup.substringDedupAgainstIndex(
      corpus.where($"doc_id" === 1L), "doc_id", "text", k, w, dir).collect()
    val capped = Dedup.substringDedupAgainstIndex(
      corpus.where($"doc_id" === 1L), "doc_id", "text", k, w, dir, maxDf = 1L).collect()
    // doc 1 shares the planted span with doc 2 only (df=1 postings
    // survive the cap); any window indexed by 2+ docs is dropped
    assert(uncapped.nonEmpty)
    assert(capped.map(_.getLong(2)).sum <= uncapped.map(_.getLong(2)).sum)
  }

  test("randomized parity: exact pairs match brute force, winnow obeys its invariants") {
    val rnd = new scala.util.Random(4111)
    val words = Vector("alpha", "beta", "gamma", "delta", "omega", "kappa",
      "sigma", "theta", "zeta", "lambda")
    def sentence(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
    for (round <- 1 to 5) {
      val k = 12 + rnd.nextInt(10) // 12..21
      val w = 2 + rnd.nextInt(6)   // 2..7
      // random docs plus planted shared spans between random pairs
      val span = sentence(8)
      val docs = (0 until 14).map { i =>
        val base = sentence(6 + rnd.nextInt(10))
        val text = if (i % 3 == 0) s"$base $span ${sentence(3)}" else base
        (i.toLong, text)
      }
      val df = docs.toDF("doc_id", "text")
      val exact = Dedup.substringDupPairs(df, "doc_id", "text", k)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // in-memory brute force
      val sets = docs.filter(_._2.length >= k).map { case (id, t) =>
        id -> (0 to t.length - k).map(i => t.substring(i, i + k)).toSet
      }.toMap
      val brute = (for {
        (a, wa) <- sets.toSeq; (b, wb) <- sets.toSeq if a < b
        shared = wa intersect wb if shared.nonEmpty
      } yield (a, b) -> shared.size.toLong).toMap
      assert(exact == brute, s"round $round k=$k")
      val win = Dedup.substringDupPairsWinnowed(df, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(win.keySet.subsetOf(brute.keySet), s"round $round k=$k w=$w")
      win.foreach { case (p, n) => assert(n <= brute(p), s"round $round") }
      // guarantee: docs sharing the planted span (length >= w+k-1
      // chars) must all be detected by the winnowed run
      val planted = docs.collect { case (id, t) if t.contains(span) => id }
      if (span.length >= w + k - 1)
        for (a <- planted; b <- planted if a < b)
          assert(win.contains((a, b)), s"round $round missed planted ($a,$b) k=$k w=$w")
    }
  }

  test("gate parameters reproduce the brute-force relation on the test corpus") {
    val docs = graft.tables.TestTables.documents(spark, sfDir)
    val fast = Dedup.substringDupPairs(docs, "doc_id", "text", k = 24, maxDf = 50L)
    // brute-force reference: per-doc distinct window sets intersected
    val sets = docs.where(length(col("text")) >= 24)
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(1), length(col("text")) - 23),
        i => col("text").substr(i, lit(24)))).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val dfCount = sets.values.toSeq.flatMap(_.toSeq).groupBy(identity).map { case (k2, v) => k2 -> v.size }
    val rare: Set[String] = dfCount.collect { case (w2, c) if c >= 2 && c <= 50 => w2 }.toSet
    val expected = (for {
      (a, wa) <- sets.toSeq; (b, wb) <- sets.toSeq if a < b
      shared = (wa intersect wb) intersect rare if shared.nonEmpty
    } yield (a, b) -> shared.size.toLong).toMap
    val got = fast.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  // ---- duplicate-span removal (the Lee et al. rewrite pass) ----

  /** Single-node reference: first-owner map built in doc-id order,
    * then per-doc covered-position mask. Shares no code with the
    * engine's interval-merge rebuild.
    */
  private def refRemove(docs: Seq[(Long, String)], k: Int): Map[Long, String] = {
    val owner = scala.collection.mutable.Map[String, Long]()
    for ((id, t) <- docs.sortBy(_._1); i <- 0 to t.length - k)
      owner.getOrElseUpdate(t.substring(i, i + k), id)
    docs.map { case (id, t) =>
      val removed = Array.fill(t.length)(false)
      for (i <- 0 to t.length - k if owner(t.substring(i, i + k)) < id)
        (i until i + k).foreach(removed(_) = true)
      id -> t.zipWithIndex.collect { case (c, i) if !removed(i) => c }.mkString
    }.toMap
  }

  private def cleanMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(3)).toMap

  test("span removal: later doc loses the shared span, first doc untouched") {
    val df = Seq((1L, "abcdefgh"), (2L, "xxabcdyy")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 8L, 0L, "abcdefgh"), (2L, 8L, 4L, "xxyy")))
  }

  test("span removal: overlapping and adjacent covered windows merge into one run") {
    // doc2 contains the whole of doc1's text: every 4-window of the
    // span is covered; the merged run must excise it in one piece,
    // not leave k-1 char fringes between window starts
    val df = Seq((1L, "ABCDEFGHIJ"), (2L, s"leftABCDEFGHIJright")).toDF("doc_id", "text")
    val m = cleanMap(Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 4))
    assert(m(1L) == "ABCDEFGHIJ")
    assert(m(2L) == "leftright")
  }

  test("span removal edge cases: short doc, full coverage, disjoint runs") {
    val df = Seq(
      (1L, "ABCDEF"),            // owner of ABCDEF windows
      (2L, "abc"),               // shorter than k: untouched
      (3L, "ABCDEF"),            // fully covered -> empty
      (4L, "ABCDxxxxxxCDEF")     // two disjoint covered runs (ABCD, CDEF)
    ).toDF("doc_id", "text")
    val m = cleanMap(Dedup.removeDuplicateSpans(df, "doc_id", "text", k = 4))
    assert(m(1L) == "ABCDEF")
    assert(m(2L) == "abc")
    assert(m(3L) == "")
    assert(m(4L) == "xxxxxx")
  }

  test("span removal: boilerplate trio — first doc keeps the block, later docs lose it") {
    val m = cleanMap(Dedup.removeDuplicateSpans(corpus, "doc_id", "text", k = 24))
    assert(m(4L).startsWith(boiler))
    assert(!m(5L).contains("LICENSE") && !m(6L).contains("LICENSE"))
  }

  test("span attribution: borrowed windows credit the GLOBAL first owner") {
    val df = Seq((1L, "abcdefgh"), (2L, "xxabcdyy")).toDF("doc_id", "text")
    val rows = Dedup.spanAttribution(df, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((2L, 1L, 1L, 3L, 3L)))
    // boilerplate trio: 5 and 6 both credit 4 (the min owner), never
    // each other, even though 5 and 6 also share those windows
    val attr = Dedup.spanAttribution(corpus, "doc_id", "text", k = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(attr.contains((5L, 4L)) && attr.contains((6L, 4L)))
    assert(!attr.contains((6L, 5L)))
  }

  test("incremental removal: index spans excised, batch-internal dups untouched, append accretes") {
    def tmp = java.nio.file.Files.createTempDirectory("rmidx").toString
    val idxPath = tmp
    val history = Seq((1L, "HISTORICAL-SPAN-ONE padding"), (2L, "other HISTORICAL-SPAN-TWO!")).toDF("doc_id", "text")
    Dedup.buildRemovalIndex(history, "doc_id", "text", k = 8, indexPath = idxPath)
    val batch = Seq(
      (100L, "xxHISTORICAL-SPAN-ONEyy"),   // span from index doc 1
      (101L, "aaBATCH-SHARED-SPANbb"),     // shared only inside the batch
      (102L, "ccBATCH-SHARED-SPANdd"),     // (id order would matter in the full run)
      (103L, "short")                      // < k: untouched
    ).toDF("doc_id", "text")
    val m1 = cleanMap(Dedup.removeSpansAgainstIndex(batch, "doc_id", "text", k = 8, idxPath))
    assert(m1(100L) == "xxyy")
    // batch-internal duplication is not this operator's job
    assert(m1(101L) == "aaBATCH-SHARED-SPANbb" && m1(102L) == "ccBATCH-SHARED-SPANdd")
    assert(m1(103L) == "short")

    // append a new history batch: its spans start being excised too
    Dedup.buildRemovalIndex(Seq((3L, "zzBATCH-SHARED-SPANzz")).toDF("doc_id", "text"),
      "doc_id", "text", k = 8, indexPath = idxPath, mode = "append")
    val m2 = cleanMap(Dedup.removeSpansAgainstIndex(batch, "doc_id", "text", k = 8, idxPath))
    assert(m2(100L) == "xxyy" && m2(101L) == "aabb" && m2(102L) == "ccdd")
  }

  test("span removal matches the single-node reference on randomized corpora") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 3) {
      val k = Seq(6, 10, 16)(round - 1)
      val alphabet = "abcd" // small alphabet -> dense accidental repeats
      val planted = (1 to k + 5).map(_ => alphabet(rnd.nextInt(4))).mkString
      val docs = (1L to 12L).map { id =>
        val body = (1 to 40 + rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(4))).mkString
        val t = if (id % 3 == 0) body.take(10) + planted + body.drop(10) else body
        (id, t)
      }
      val df = docs.toDF("doc_id", "text")
      val got = cleanMap(Dedup.removeDuplicateSpans(df, "doc_id", "text", k))
      val want = refRemove(docs, k)
      assert(got == want, s"round $round k=$k")

      // incremental parity on the same corpus: index = ids % 2 == 1,
      // batch = the rest; reference = plain window-set membership
      val idxDocs = docs.filter(_._1 % 2 == 1)
      val batchDocs = docs.filter(_._1 % 2 == 0)
      val idxPath = java.nio.file.Files.createTempDirectory(s"rmidx_r$round").toString
      Dedup.buildRemovalIndex(idxDocs.toDF("doc_id", "text"), "doc_id", "text", k, idxPath)
      val gotIncr = cleanMap(Dedup.removeSpansAgainstIndex(
        batchDocs.toDF("doc_id", "text"), "doc_id", "text", k, idxPath))
      val idxWins = idxDocs.flatMap { case (_, t) =>
        (0 to t.length - k).map(i => t.substring(i, i + k)) }.toSet
      val wantIncr = batchDocs.map { case (id, t) =>
        val removed = Array.fill(t.length)(false)
        for (i <- 0 to t.length - k if idxWins(t.substring(i, i + k)))
          (i until i + k).foreach(removed(_) = true)
        id -> t.zipWithIndex.collect { case (c, i) if !removed(i) => c }.mkString
      }.toMap
      assert(gotIncr == wantIncr, s"round $round incremental k=$k")
    }
  }
}
