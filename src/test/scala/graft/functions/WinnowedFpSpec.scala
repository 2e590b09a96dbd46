package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** The single-pass winnowing kernel vs an independent declarative
  * reference: the md5-HEX-STRING rightmost-min selection (the exact
  * formulation the DuckDB oracle CTEs and winnow_replay.py use),
  * implemented here with hex strings and a per-window linear scan —
  * no shared code with the deque/unsigned-long kernel under test.
  */
class WinnowedFpSpec extends SparkSpec {

  /** Reference selection: distinct selected gram values → md5 digests. */
  private def reference(s: String, k: Int, w: Int): Set[Seq[Byte]] = {
    val cps = s.codePoints().toArray
    if (cps.length < k + w - 1) return Set.empty
    val grams = (0 to cps.length - k).map(i => new String(cps, i, k))
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = grams.map(g => md.digest(g.getBytes("UTF-8")).toSeq)
    val hex = digests.map(_.map(b => f"${b & 0xFF}%02x").mkString)
    val sel = scala.collection.mutable.Set[Int]()
    for (p <- 0 to hex.length - w) {
      val window = hex.slice(p, p + w)
      val mn = window.min
      sel += p + window.lastIndexOf(mn)
    }
    sel.map(digests).toSet
  }

  private def kernel(s: String, k: Int, w: Int): Set[Seq[Byte]] = {
    val ad = WinnowedFp.winnowed(UTF8String.fromString(s), k, w)
    (0 until ad.numElements()).map(i => ad.getBinary(i).toSeq).toSet
  }

  test("kernel matches the hex-string reference on randomized small-alphabet text") {
    val rnd = new scala.util.Random(421)
    for (round <- 1 to 60) {
      val n = 1 + rnd.nextInt(120)
      val s = Seq.fill(n)("ab".charAt(rnd.nextInt(2))).mkString
      val k = 1 + rnd.nextInt(5)
      val w = 1 + rnd.nextInt(6)
      assert(kernel(s, k, w) == reference(s, k, w), s"round $round k=$k w=$w s=$s")
    }
  }

  test("kernel matches the reference on non-BMP text (code-point gram boundaries)") {
    val rnd = new scala.util.Random(77)
    val alphabet = Array("a", "é", "中", "😀", "🍕")
    for (round <- 1 to 40) {
      val n = 1 + rnd.nextInt(60)
      val s = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val k = 1 + rnd.nextInt(4)
      val w = 1 + rnd.nextInt(5)
      assert(kernel(s, k, w) == reference(s, k, w), s"round $round k=$k w=$w")
    }
  }

  test("ties select the rightmost position but dedupe by value") {
    // one gram repeated everywhere: every window's min is the same
    // value; selection picks positions, output collapses to ONE digest
    val s = "aaaaaaaaaaaaaaaa"
    val out = kernel(s, 3, 4)
    assert(out == reference(s, 3, 4))
    assert(out.size == 1)
  }

  test("short text (< k + w - 1 code points) yields no windows") {
    assert(kernel("abcdef", 4, 4) == Set.empty)
    assert(kernel("", 2, 2) == Set.empty)
  }

  test("WindowStats: per-distinct-window occurrence stats match a brute reference") {
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 40) {
      val n = 1 + rnd.nextInt(80)
      val s = Seq.fill(n)("abc".charAt(rnd.nextInt(3))).mkString
      val k = 1 + rnd.nextInt(4)
      // brute reference over code-point windows
      val cps = s.codePoints().toArray
      val ref = (0 to cps.length - k).map(i => (new String(cps, i, k), i + 1))
        .groupBy(_._1).map { case (g, occ) =>
          val fps = SubstringFp.fingerprints(UTF8String.fromString(g), k, false)
          (fps.getBinary(0).toSeq, (occ.size, occ.map(_._2).min, occ.map(_._2).max))
        }
      val ad = WindowStats.stats(UTF8String.fromString(s), k)
      val got = (0 until ad.numElements()).map { i =>
        val r = ad.getStruct(i, 4)
        (r.getBinary(0).toSeq, (r.getInt(1), r.getInt(2), r.getInt(3)))
      }.toMap
      assert(got == ref, s"round $round k=$k s=$s")
    }
  }

  test("emitted digest IS md5 of the gram's UTF-8 bytes") {
    val s = "xyzxyzxyz"
    val md = java.security.MessageDigest.getInstance("MD5")
    val allGramDigests = (0 to s.length - 3)
      .map(i => md.digest(s.substring(i, i + 3).getBytes("UTF-8")).toSeq).toSet
    assert(kernel(s, 3, 2).subsetOf(allGramDigests))
    assert(kernel(s, 3, 2).nonEmpty)
  }
}
