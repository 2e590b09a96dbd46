package graft.dataprep

import graft.SparkSpec

/** BPE tokenizer training (Sennrich et al. 2016): word-internal char
  * merges, frequency-weighted, deterministic tie-break, greedy
  * left-to-right apply.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("merges learned in frequency order with hand-computed folds") {
    // words: aaab x2, ab x1
    // r1: (a,a)=4 beats (a,b)=3          -> aaab=[aa,a,b], ab=[a,b]
    // r2: (a,b)=2+1=3 beats (aa,a)=2     -> aaab=[aa,ab],  ab=[ab]
    // r3: (aa,ab)=2 is the only pair     -> aaab=[aaab]
    val df = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrainMerges(df, "text", nMerges = 3)
    assert(merges == Seq(("a", "a"), ("a", "b"), ("aa", "ab")))

    val applied = CorpusStats.bpeApply(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc1: two words, each a single unit "aaab"; doc2: one unit "ab"
    assert(applied(0)._2 == 2L && applied(0)._3 == 2L)
    assert(applied(1)._2 == 1L && applied(1)._3 == 1L)
  }

  test("greedy fold is leftmost-first: aaa with (a,a) gives [aa, a]") {
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = CorpusStats.bpeApply(df, "doc_id", "text", Seq(("a", "a")))
      .collect()(0)
    assert(out.getLong(2) == 2L) // [aa, a], not [a, aa] merged again
    // digest must equal the md5 of the exact segmentation string
    assert(out.getString(3) ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("aa a".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
  }

  test("equal counts break ties by (l, r) ascending") {
    val df = Seq((1L, "xy ab")).toDF("doc_id", "text")
    val merges = CorpusStats.bpeTrainMerges(df, "text", nMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("training exhausts gracefully when no pairs remain") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text") // 1-char words only
    assert(CorpusStats.bpeTrainMerges(df, "text", nMerges = 5).isEmpty)
  }

  test("vocab ranks by weighted frequency; encode round-trips the segmentation") {
    val df = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"))
    // folded words: aaab -> [aa, ab] (x2 occurrences), ab -> [ab]
    // counts: ab = 2 + 1 = 3, aa = 2 -> ids: ab=1, aa=2
    val vocab = CorpusStats.bpeVocab(df, "text", merges)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(vocab.toSeq == Seq((1L, "ab", 3L), (2L, "aa", 2L)))
    val enc = CorpusStats.bpeEncode(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc1: [aa, ab][aa, ab] -> ids 2,1,2,1; doc2: [ab] -> 1
    assert(enc.toSeq == Seq((1L, 4L, m("2,1,2,1")), (2L, 1L, m("1"))))
  }

  test("training is deterministic across runs") {
    val docs = graft.tables.TestTables.documents(spark, sfDir)
    val a = CorpusStats.bpeTrainMerges(docs, "text", nMerges = 4)
    val b = CorpusStats.bpeTrainMerges(docs, "text", nMerges = 4)
    assert(a == b && a.length == 4)
  }
}
