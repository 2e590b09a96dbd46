package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The rolling window-fingerprint kernel: hash arithmetic against a
  * BigInt model, rolling-vs-direct agreement, window-equality
  * faithfulness, code-point position semantics (incl. non-BMP), and
  * plan-level parity of the fingerprint-keyed span-removal family
  * with a substring-keyed reference implementation.
  */
class SubstringFpSpec extends SparkSpec {
  import spark.implicits._

  private val P = SubstringFp.P

  private def fps(s: String, k: Int, distinct: Boolean = false): Seq[Array[Byte]] = {
    val ad = SubstringFp.fingerprints(UTF8String.fromString(s), k, distinct)
    (0 until ad.numElements()).map(ad.getBinary)
  }

  private def key(b: Array[Byte]): Seq[Byte] = b.toSeq

  /** Direct (non-rolling) BigInt evaluation of both window hashes. */
  private def direct(s: String, k: Int): Seq[Seq[Byte]] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - k).map { i =>
      def h(base: Long): Long =
        cps.slice(i, i + k).foldLeft(BigInt(0)) { (acc, c) =>
          (acc * base + (c + 1)) mod BigInt(P)
        }.toLong
      val b = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(b)
      out.writeLong(h(SubstringFp.B1)); out.writeLong(h(SubstringFp.B2))
      b.toByteArray.toSeq
    }
  }

  test("mulmod matches BigInt over random 61-bit operands") {
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong().abs % P
      val b = rnd.nextLong().abs % P
      assert(SubstringFp.mulmod(a, b) ==
        ((BigInt(a) * BigInt(b)) mod BigInt(P)).toLong)
    }
  }

  test("rolling fingerprints equal the direct polynomial, random strings") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(120)
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val k = 1 + rnd.nextInt(12)
      assert(fps(s, k).map(key) == direct(s, k))
    }
  }

  test("fingerprint equality is window equality on a small alphabet") {
    // 2-char alphabet, every window of every string: equal windows ⟺
    // equal fingerprints (no collisions, no missed repeats)
    val rnd = new scala.util.Random(29)
    val strs = (1 to 30).map(_ =>
      (1 to 40).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    val k = 5
    val byFp = scala.collection.mutable.Map[Seq[Byte], String]()
    strs.foreach { s =>
      fps(s, k).zipWithIndex.foreach { case (f, i) =>
        val w = s.substring(i, i + k)
        byFp.get(key(f)) match {
          case Some(prev) => assert(prev == w, "collision")
          case None       => byFp(key(f)) = w
        }
      }
    }
    // all 32 length-5 binary windows occur across 30×36 windows; the
    // map must have exactly as many entries as distinct substrings
    val distinctWins = strs.flatMap(s => s.sliding(k)).toSet
    assert(byFp.size == distinctWins.size)
  }

  test("distinct=true emits each fingerprint once, same set") {
    val s = "abcabcabcabc"
    val all = fps(s, 3).map(key)
    val d = fps(s, 3, distinct = true).map(key)
    assert(d.toSet == all.toSet)
    assert(d.size == d.toSet.size)
    assert(all.size == s.length - 2)
  }

  test("positions are code points: non-BMP text windows align with substr") {
    // U+1F600 is a surrogate pair in the JVM but ONE code point to
    // Spark's length/substr — window i must hash code points i..i+k-1
    val s = "ab😀cd😀ab😀cd"
    val k = 3
    val got = fps(s, k).map(key)
    val cps = s.codePoints().toArray
    assert(got.size == cps.length - k + 1)
    // repeated code-point windows repeat: windows starting at code
    // points 0 and 6 are both ['a','b',U+1F600]
    assert(got(0) == got(6))
    // and adjacent windows differ
    assert(got(0) != got(1))
  }

  test("short text and k-length text edge cases") {
    assert(fps("abc", 4).isEmpty)
    assert(fps("", 1).isEmpty)
    assert(fps("abcd", 4).size == 1)
    assert(fps("abcd", 4).map(key) == direct("abcd", 4))
  }

  /** Substring-keyed reference of removeDuplicateSpans — the exact
    * plan the operator shipped before fingerprints (transform/substr
    * extraction, string win keys). Parity here proves the key swap
    * changed no semantics.
    */
  private def removalReference(df: DataFrame, k: Int): DataFrame = {
    val positioned = df.where(length(col("text")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => col("text").substr(i, lit(k)))))
      .select(col("doc_id"), (col("pos") + 1).as("start"), col("col").as("win"))
    val w = Window.partitionBy(col("win"))
    val covered = positioned
      .withColumn("first_id", min(col("doc_id")).over(w))
      .where(col("first_id") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("start"))).as("starts"))
    covered
  }

  test("span removal parity: fingerprint keys reproduce substring keys") {
    // seeded corpus with planted cross-doc spans, within-doc repeats,
    // non-ASCII BMP text, AND astral (non-BMP) text — the one input
    // class where JVM char offsets diverge from Spark's code-point
    // substr/length, so the expected rebuild below must index by
    // CODE POINT, mirroring the dedicated non-BMP kernel test at the
    // end-to-end level
    val rnd = new scala.util.Random(42)
    val span1 = "le vif renard brun saute par-dessus le chien paresseux é"
    val span2 = "пример общего длинного дублированного фрагмента текста"
    val span3 = "🦊 astral span body 🎯 shared across two documents 🦊"
    def filler(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val docs = Seq(
      (1L, s"${filler(30)} $span1 ${filler(20)}"),
      (2L, s"${filler(25)} $span1 ${filler(15)} $span2"),
      (3L, s"$span2 ${filler(40)}"),
      (4L, s"${filler(10)} $span1 $span1 ${filler(5)}"), // within-doc repeat
      (5L, filler(60)),
      (6L, "short"),
      (7L, s"${filler(12)} $span3 ${filler(9)} 😀"),
      (8L, s"😀${filler(7)} $span3 ${filler(18)}")
    ).toDF("doc_id", "text")
    val k = 24
    val got = graft.dataprep.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", k)
      .select("doc_id", "n_chars", "n_removed", "clean_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // rebuild expected clean_text from the reference covered-starts,
    // positioned in CODE POINTS (Spark's substr/length unit) — char
    // indexing would misplace every start after a surrogate pair
    val cov = removalReference(docs, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val exp = docs.collect().map { r =>
      val id = r.getLong(0); val t = r.getString(1)
      val cps = t.codePoints().toArray
      val starts = cov.getOrElse(id, Seq.empty)
      val removed = Array.fill(cps.length)(false)
      starts.foreach(s0 => (s0 - 1 until math.min(cps.length, s0 - 1 + k))
        .foreach(removed(_) = true))
      val sb = new java.lang.StringBuilder
      cps.indices.filterNot(removed).foreach(i => sb.appendCodePoint(cps(i)))
      val clean = sb.toString
      (id, cps.length.toLong, (cps.length - clean.codePoints().count()).toLong, clean)
    }.sortBy(_._1).toSeq
    assert(got.toSeq == exp)
    // the corpus genuinely exercises removal, including on the astral
    // docs (7 keeps its text, 8 loses the shared astral span)
    assert(got.exists(_._3 > 0))
    assert(got.find(_._1 == 8L).exists(_._3 > 0))
  }

  test("seeded bases: distinct from defaults, relation-invariant") {
    // seed = 0 is the historical constants; any other seed derives
    // two distinct in-range bases, different fingerprints — but the
    // same dedup RELATION (equal windows still collide, unequal ones
    // still don't at test scale)
    assert(SubstringFp.bases(0L) == (SubstringFp.B1, SubstringFp.B2))
    val (a1, a2) = SubstringFp.bases(12345L)
    val (b1, b2) = SubstringFp.bases(67890L)
    Seq(a1, a2, b1, b2).foreach { b =>
      assert(b > (1L << 20) && b < P)
    }
    assert(a1 != a2 && b1 != b2 && (a1, a2) != (b1, b2))
    def seededFps(s: String, k: Int, seed: Long): Seq[Seq[Byte]] = {
      val ad = SubstringFp.fingerprints(UTF8String.fromString(s), k, false, seed)
      (0 until ad.numElements()).map(ad.getBinary(_).toSeq)
    }
    val s = "abcabcabcxyzabc"
    val f0 = seededFps(s, 3, 0L)
    val f7 = seededFps(s, 3, 7L)
    assert(f0 != f7) // different bases, different values
    // but the equality structure (which window pairs match) is identical
    def eqPairs(f: Seq[Seq[Byte]]) =
      (for { i <- f.indices; j <- f.indices if i < j && f(i) == f(j) }
        yield (i, j)).toSet
    assert(eqPairs(f0) == eqPairs(f7))
    // end-to-end: removeDuplicateSpans under a non-zero seed equals
    // the seed-0 result (same relation, different shuffle keys)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "prefix text the quick brown fox jumps over the lazy dog tail"),
      (3L, "unrelated content entirely different from the others here")
    ).toDF("doc_id", "text")
    val r0 = graft.dataprep.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", 24)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    val r7 = graft.dataprep.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", 24, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSet
    assert(r0 == r7)
  }

  test("adversarial collision: public seed-0 bases merge a crafted pair, any secret seed separates") {
    // The contract note (SubstringFp scaladoc) states that an
    // adversary who knows the PUBLIC seed-0 bases can construct two
    // DIFFERENT k-windows with equal 16-byte fingerprints. This is
    // that attack, executed: the difference vector below was found by
    // LLL over the rank-24 lattice { d : d(B1) ≡ d(B2) ≡ 0 (mod P) }
    // (two congruence columns scaled by 2^80, Minkowski bound ≈ 2^5.1
    // for det = P², so coefficients this small MUST exist) — max
    // |d_i| = 19, well inside printable ASCII around 'a'.
    val d = Array(-14, -12, -1, 15, 8, 11, 2, -11, 19, 14, -1, -5, -1,
      15, -12, 8, -5, -14, -6, 5, -18, -5, -3, -7)
    assert(d.length == 24)
    val w1 = "a" * 24
    val w2 = d.map(di => ('a' + di).toChar).mkString
    assert(w1 != w2)
    // sanity: the pair satisfies both congruences (BigInt model)
    Seq(SubstringFp.B1, SubstringFp.B2).foreach { base =>
      val diff = d.indices.foldLeft(BigInt(0)) { (acc, i) =>
        (acc * base + BigInt(d(i)) + BigInt(P)) mod BigInt(P)
      }
      assert(diff == 0, s"difference polynomial not ≡ 0 at base $base")
    }
    def fpsAt(s: String, seed: Long): Seq[Seq[Byte]] = {
      val ad = SubstringFp.fingerprints(UTF8String.fromString(s), 24, false, seed)
      (0 until ad.numElements()).map(ad.getBinary(_).toSeq)
    }
    // (a) seed 0: the two DISTINCT windows carry ONE fingerprint —
    //     the kernel itself is fooled...
    assert(fpsAt(w1, 0L) == fpsAt(w2, 0L))
    // ...and span removal WRONGLY excises the victim's text: doc 2's
    // only window "matches" doc 1's, so its entire (non-duplicate)
    // content is removed — the attack's end-to-end effect.
    val docs = Seq((1L, w1), (2L, w2)).toDF("doc_id", "text")
    val merged = graft.dataprep.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", 24)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(merged(1L) == (0L, w1)) // owner untouched
    assert(merged(2L) == (24L, "")) // victim wrongly emptied
    // (b) any nonzero secret seed redraws the bases; the crafted pair
    //     no longer collides and the victim document survives intact,
    //     restoring the stated (k−1)/P per-hash bound.
    Seq(1L, 42L, 0xDEADBEEFL, 7777777L).foreach { seed =>
      assert(fpsAt(w1, seed) != fpsAt(w2, seed),
        s"crafted pair still collides under seed $seed")
      val kept = graft.dataprep.Dedup
        .removeDuplicateSpans(docs, "doc_id", "text", 24, seed = seed)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
      assert(kept(1L) == (0L, w1))
      assert(kept(2L) == (0L, w2), s"victim text excised under secret seed $seed")
    }
  }

  test("index format marker: stamped on build, validated on probe") {
    val base = s"${graft.GraftTmp.dir}/graft_test_idxmarker_${System.nanoTime()}"
    val hist = Seq((1L, "the indexed historical span that repeats verbatim later on"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "prefix the indexed historical span that repeats verbatim later on"))
      .toDF("doc_id", "text")
    graft.dataprep.Dedup.buildRemovalIndex(hist, "doc_id", "text", 24,
      indexPath = base, seed = 99L)
    // probe reads the seed from the marker — removal happens even
    // though the caller never states the seed
    val out = graft.dataprep.Dedup
      .removeSpansAgainstIndex(batch, "doc_id", "text", 24, base)
      .collect()
    assert(out.head.getAs[Long]("n_removed") > 0)
    // k drift fails fast instead of matching zero windows
    val eK = intercept[IllegalArgumentException] {
      graft.dataprep.Dedup.removeSpansAgainstIndex(batch, "doc_id", "text", 25, base)
    }
    assert(eK.getMessage.contains("drift"))
    // append under different parameters fails fast
    val eB = intercept[IllegalArgumentException] {
      graft.dataprep.Dedup.buildRemovalIndex(hist, "doc_id", "text", 24,
        indexPath = base, mode = "overwrite",
        partition = Some("batch=1"), seed = 100L)
    }
    assert(eB.getMessage.contains("may not mix"))
    // a v1 index (data, no marker) is rejected on probe AND on append
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base, "_graft_index_format.json"), false)
    val eV1p = intercept[IllegalArgumentException] {
      graft.dataprep.Dedup.removeSpansAgainstIndex(batch, "doc_id", "text", 24, base)
    }
    assert(eV1p.getMessage.contains("format marker"))
    val eV1b = intercept[IllegalArgumentException] {
      graft.dataprep.Dedup.buildRemovalIndex(hist, "doc_id", "text", 24,
        indexPath = base, partition = Some("batch=2"), seed = 99L)
    }
    assert(eV1b.getMessage.contains("predates"))
    fs.delete(new org.apache.hadoop.fs.Path(base), true): Unit
  }

  test("substring pair parity: fingerprint pairs match substring pairs") {
    val rnd = new scala.util.Random(99)
    def filler(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
    val shared = "zzzz shared window content block zzzz"
    val docs = (1L to 12L).map { i =>
      val body = filler(50)
      (i, if (i % 3 == 0) s"$body $shared" else body)
    }.toDF("doc_id", "text")
    val k = 24
    val got = graft.dataprep.Dedup
      .substringDupPairs(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute reference on substring sets
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val exp = (for {
      (a, ta) <- rows; (b, tb) <- rows if a < b
      n = ta.sliding(k).toSet.intersect(tb.sliding(k).toSet).size if n > 0
    } yield (a, b, n.toLong)).toSet
    assert(got == exp)
    assert(exp.nonEmpty)
  }
}
