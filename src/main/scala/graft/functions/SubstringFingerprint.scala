package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling fingerprints for the character-window dedup
  * family (Karp & Rabin, "Efficient randomized pattern-matching
  * algorithms", IBM JRD 1987; the window relation itself follows Lee
  * et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL 2022 — cf. the reference's token-window text search,
  * seq-db `parser/tokenizer.go`, which likewise never ships raw text
  * through its index, only fixed-width token ids).
  *
  * One O(chars) pass computes, per window start, two independent
  * degree-(k−1) polynomial hashes over the window's code points,
  * each evaluated modulo the Mersenne prime 2^61−1 with its own
  * fixed public base. The pair is emitted as one 16-byte big-endian
  * value, so downstream operators group/partition/join on a
  * fixed-width binary key instead of a k-char substring:
  *
  *   - shuffle bytes per window drop from ~k chars to 16 bytes
  *     (k=24 → ~2.5× narrower exchange, and no per-window substring
  *     materialization on the map side at all — the O(chars × k)
  *     string blow-up the family used to pay becomes O(chars));
  *   - the exchanged key is fixed-width, so sorter comparisons are
  *     two-word compares rather than variable-length byte scans.
  *
  * Collision contract (the price of the narrowing, stated rather
  * than hidden): two DIFFERENT windows map to one key only if both
  * 61-bit polynomial hashes collide. With bases UNKNOWN to the
  * input's author and prime modulus, each hash collides for a fixed
  * window pair with probability ≤ (k−1)/(2^61−1); across W distinct
  * corpus windows the union bound gives
  * P[any collision] ≤ W²/2 · ((k−1)/2^61)² — at W = 10^13 (a
  * ~100 TB corpus) and k = 24 that is < 10^-10. That bound is
  * conditional on base secrecy: the DEFAULT bases (seed = 0) are
  * fixed public constants, and an adversary who knows both bases
  * and the modulus can construct two distinct k-windows with equal
  * 16-byte fingerprints (lattice reduction over code-point
  * difference vectors vanishing mod P at both bases — small
  * coefficients suffice for k = 24), making span removal excise
  * non-duplicate text from a victim document. So: with seed = 0 the
  * bound covers NON-ADVERSARIAL corpora only; for untrusted/hostile
  * input (scraped web text), pass a per-job secret `seed` — the
  * bases are then derived by SplitMix64 and unknown to the input's
  * author, which restores the stated bound (the prime modulus has
  * no base-independent bad input class, unlike polynomials mod
  * 2^64). All rows of one relation must share one seed; persisted
  * indexes record theirs in the format marker
  * ([[graft.dataprep.Dedup.buildRemovalIndex]]).
  *
  * Positions are code points (matching `substr`/`length` semantics,
  * so excision offsets computed from these fingerprints line up with
  * `substr` rebuilds even on non-BMP text).
  */
object SubstringFp {
  /** Mersenne prime 2^61 − 1. */
  val P: Long = (1L << 61) - 1
  /** Default bases (seed = 0), arbitrary values in (2^20, P−1)
    * chosen once; independence of the two hashes needs only distinct
    * bases. PUBLIC — see the contract note: fine for non-adversarial
    * corpora, pass a secret seed for hostile input.
    */
  val B1: Long = 0x1619E4EB0B72CL // 388097432467244
  val B2: Long = 0x7A0B3D59F1C65L // 2146664359714917

  /** The two rolling-hash bases for a job seed. seed = 0 reproduces
    * the historical fixed constants (existing oracles and persisted
    * indexes stay valid); any other seed draws two distinct
    * pseudo-random bases in (2^20, P−1) via SplitMix64, so an
    * adversary without the seed cannot construct colliding windows.
    */
  def bases(seed: Long): (Long, Long) = {
    if (seed == 0L) (B1, B2)
    else {
      var s = seed
      def next(): Long = {
        s += 0x9E3779B97F4A7C15L
        var z = s
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^ (z >>> 31)
      }
      val lo = (1L << 20) + 1
      val range = P - lo // draws land in [lo, P-1]
      def draw(): Long = (next() & Long.MaxValue) % range + lo
      val b1 = draw()
      var b2 = draw()
      while (b2 == b1) b2 = draw()
      (b1, b2)
    }
  }

  /** (a * b) mod P for a, b < P, via the 128-bit product split:
    * hi·2^64 + lo ≡ hi·8 + (lo >>> 61)·1? — precisely,
    * hi·2^64 + lo = (hi·2^3 + lo>>>61)·2^61 + (lo & P)
    * and 2^61 ≡ 1 (mod P).
    */
  @inline def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    val r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    if (r >= P) r - P else r
  }

  @inline private def addmod(a: Long, b: Long): Long = {
    val r = a + b
    if (r >= P) r - P else r
  }

  /** All length-`k` code-point-window fingerprints of `text`, in
    * window order (element i = window starting at code point i,
    * 0-based); with `distinct` the positional order is dropped and
    * each fingerprint appears once. Empty array when the text is
    * shorter than k code points. `seed` selects the hash bases (see
    * [[bases]]); all rows of one relation must share one seed.
    */
  def fingerprints(text: UTF8String, k: Int, distinct: Boolean): ArrayData =
    fingerprints(text, k, distinct, 0L)

  def fingerprints(text: UTF8String, k: Int, distinct: Boolean,
      seed: Long): ArrayData = {
    val (bs1, bs2) = bases(seed)
    val s = text.toString
    val sl = s.length
    // one pass: code points (Spark's length()/substr() unit)
    var n = 0
    var ci = 0
    while (ci < sl) { ci += Character.charCount(s.codePointAt(ci)); n += 1 }
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val cps = new Array[Int](n)
    ci = 0
    var i = 0
    while (ci < sl) {
      val cp = s.codePointAt(ci)
      cps(i) = cp; i += 1; ci += Character.charCount(cp)
    }
    val m = n - k + 1
    // B^(k-1) mod P for the outgoing-char removal
    var pw1 = 1L; var pw2 = 1L
    var j = 0
    while (j < k - 1) { pw1 = mulmod(pw1, bs1); pw2 = mulmod(pw2, bs2); j += 1 }
    val out = new Array[Any](m)
    var a1 = 0L; var a2 = 0L
    j = 0
    while (j < k) {
      val c = (cps(j) + 1).toLong // +1: code point 0 still contributes
      a1 = addmod(mulmod(a1, bs1), c)
      a2 = addmod(mulmod(a2, bs2), c)
      j += 1
    }
    out(0) = encode(a1, a2)
    var p = 1
    while (p < m) {
      val drop = (cps(p - 1) + 1).toLong
      val add = (cps(p + k - 1) + 1).toLong
      a1 = addmod(mulmod(addmod(a1, P - mulmod(drop, pw1)), bs1), add)
      a2 = addmod(mulmod(addmod(a2, P - mulmod(drop, pw2)), bs2), add)
      out(p) = encode(a1, a2)
      p += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // exact per-doc distinct: sort (any total order) + unique scan —
    // O(m log m), vs array_distinct's generic-path O(m²) equality scan
    val arr = out.asInstanceOf[Array[AnyRef]]
    java.util.Arrays.sort(arr, (x: AnyRef, y: AnyRef) =>
      java.util.Arrays.compare(
        x.asInstanceOf[Array[Byte]], y.asInstanceOf[Array[Byte]]))
    var w = 1
    var r = 1
    while (r < m) {
      if (!java.util.Arrays.equals(arr(r).asInstanceOf[Array[Byte]],
          arr(w - 1).asInstanceOf[Array[Byte]])) {
        arr(w) = arr(r); w += 1
      }
      r += 1
    }
    if (w == m) new GenericArrayData(arr)
    else new GenericArrayData(java.util.Arrays.copyOf(arr, w))
  }

  private def encode(h1: Long, h2: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    var v = h1
    var i = 7
    while (i >= 0) { b(i) = v.toByte; v >>>= 8; i -= 1 }
    v = h2
    i = 15
    while (i >= 8) { b(i) = v.toByte; v >>>= 8; i -= 1 }
    b
  }
}

/** Single-pass winnowing kernel (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003) — the imperative form of the rightmost-min selection
  * [[graft.dataprep.Dedup.winnowedWindows]] declares. The SELECTION
  * CONTRACT is bit-identical to the declarative/SQL formulation both
  * oracles replicate: per window of `w` consecutive k-gram md5
  * digests, keep the RIGHTMOST position holding the minimum digest,
  * where digests order as their lowercase-hex strings (hex encoding
  * is order-preserving, so that is exactly unsigned byte order of the
  * raw 16 digest bytes — compared here as two big-endian unsigned
  * longs, no hex materialization).
  *
  * What changes is only the evaluation strategy and the emitted key:
  *   - one monotonic-deque pass replaces the O(m·w)
  *     slice/reverse/array_position array algebra (m = gram count),
  *     and no k-char gram or 32-char hex string is ever materialized
  *     as a row value — md5 runs over byte slices of the document's
  *     own UTF-8 buffer;
  *   - the emitted window key is the raw 16-byte digest instead of
  *     the k-char substring: hex(digest) ↔ digest is a bijection, so
  *     every downstream relation (pair counts, DF caps, index
  *     probes) is unchanged, while the shuffled key narrows from ~k
  *     chars to 16 fixed-width bytes.
  *
  * Gram i spans code points [i, i+k) (1-based position i+1 in
  * `substr` terms), so its UTF-8 byte slice equals
  * `substr(text, i+1, k).cast(binary)` — the exact bytes the
  * declarative form fed to md5.
  */
object WinnowedFp {
  /** Distinct selected-window digests of `text` under (k, w)
    * winnowing, as 16-byte binaries; empty when the text has fewer
    * than k + w - 1 code points (no full hash window exists).
    */
  def winnowed(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val bl = bytes.length
    // code-point byte offsets: off(j) = byte start of code point j
    var n = 0
    var bi = 0
    while (bi < bl) { bi += cpLen(bytes(bi)); n += 1 }
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val off = new Array[Int](n + 1)
    bi = 0
    var j = 0
    while (bi < bl) { off(j) = bi; j += 1; bi += cpLen(bytes(bi)) }
    off(n) = bl
    val m = n - k + 1
    // per-gram md5 digest as two big-endian unsigned longs
    val md = java.security.MessageDigest.getInstance("MD5")
    val buf = new Array[Byte](16)
    val hi = new Array[Long](m)
    val lo = new Array[Long](m)
    var i = 0
    while (i < m) {
      md.update(bytes, off(i), off(i + k) - off(i))
      md.digest(buf, 0, 16)
      hi(i) = be64(buf, 0)
      lo(i) = be64(buf, 8)
      i += 1
    }
    // rightmost-min over each w-window: monotonic deque of indices
    // with STRICTLY increasing digests (ties pop, so the surviving
    // front is the rightmost occurrence of the window minimum)
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val selected = new Array[Boolean](m)
    i = 0
    while (i < m) {
      while (tail > head && cmpLe(hi(i), lo(i), hi(dq(tail - 1)), lo(dq(tail - 1))))
        tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) selected(dq(head)) = true
      i += 1
    }
    // distinct by digest VALUE (a gram repeated in one doc can be
    // selected at two positions): sort selected indices by digest,
    // unique-scan, emit
    var cnt = 0
    i = 0
    while (i < m) { if (selected(i)) cnt += 1; i += 1 }
    val sel = new Array[Integer](cnt)
    var s = 0
    i = 0
    while (i < m) { if (selected(i)) { sel(s) = Integer.valueOf(i); s += 1 }; i += 1 }
    java.util.Arrays.sort(sel, (a: Integer, b: Integer) => {
      val c = java.lang.Long.compareUnsigned(hi(a), hi(b))
      if (c != 0) c else java.lang.Long.compareUnsigned(lo(a), lo(b))
    })
    val out = new Array[Any](cnt)
    var wout = 0
    i = 0
    while (i < cnt) {
      val p = sel(i).intValue()
      if (i == 0 || hi(p) != hi(sel(i - 1).intValue()) ||
          lo(p) != lo(sel(i - 1).intValue())) {
        out(wout) = digestBytes(hi(p), lo(p)); wout += 1
      }
      i += 1
    }
    if (wout == cnt) new GenericArrayData(out)
    else new GenericArrayData(
      java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], wout))
  }

  /** a <= b in unsigned 128-bit (= md5-hex lexical) order. */
  @inline private def cmpLe(ah: Long, al: Long, bh: Long, bl: Long): Boolean = {
    val c = java.lang.Long.compareUnsigned(ah, bh)
    c < 0 || (c == 0 && java.lang.Long.compareUnsigned(al, bl) <= 0)
  }

  @inline private def cpLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1
    else if ((u & 0xE0) == 0xC0) 2
    else if ((u & 0xF0) == 0xE0) 3
    else if ((u & 0xF8) == 0xF0) 4
    else 1 // defensive: treat a stray continuation byte as width 1
  }

  @inline private def be64(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(o + i) & 0xFFL); i += 1 }
    v
  }

  private def digestBytes(h: Long, l: Long): Array[Byte] = {
    val b = new Array[Byte](16)
    var v = h
    var i = 7
    while (i >= 0) { b(i) = v.toByte; v >>>= 8; i -= 1 }
    v = l
    i = 15
    while (i >= 8) { b(i) = v.toByte; v >>>= 8; i -= 1 }
    b
  }
}

/** Per-doc window OCCURRENCE STATS, grouped by window value inside
  * the extraction pass: one struct per DISTINCT window of the text —
  * (win: the 16-byte Karp–Rabin fingerprint, n_occ, min_start,
  * max_start), starts 1-based in code points. This is the probe-side
  * frame for aggregated per-(doc, window) consumers (span
  * attribution): the intra-doc collapse happens here, in the map
  * task that produced the text, so the downstream exchange carries
  * one fixed-width row per distinct (doc, window) instead of one per
  * occurrence — and no posexplode runs at all.
  */
object WindowStats {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  def stats(text: UTF8String, k: Int): ArrayData = stats(text, k, 0L)

  def stats(text: UTF8String, k: Int, seed: Long): ArrayData = {
    val all = SubstringFp.fingerprints(text, k, distinct = false, seed)
    val m = all.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    // single pass over occurrences through a primitive open-addressing
    // table keyed by the fingerprint's two 61-bit halves — replaces a
    // boxed-Integer merge sort with byte-array comparators that
    // dominated the extraction at 10x scale (sf1 span attribution:
    // ~15 s sorted vs ~O(m) hashed). Output order is unspecified by
    // contract (every consumer explodes and re-aggregates).
    val cap = Integer.highestOneBit(math.max(4, 2 * m - 1)) << 1
    val mask = cap - 1
    val kh1 = new Array[Long](cap)
    val kh2 = new Array[Long](cap)
    val slotKey = new Array[Array[Byte]](cap) // first-seen 16-byte key
    val slotOcc = new Array[Int](cap) // 0 = empty (occurrences are >= 1)
    val slotMin = new Array[Int](cap)
    val slotMax = new Array[Int](cap)
    val order = new Array[Int](m) // first-seen slot order for emission
    var nd = 0
    var i = 0
    while (i < m) {
      val b = all.getBinary(i)
      var v1 = 0L; var v2 = 0L
      var j = 0
      while (j < 8) { v1 = (v1 << 8) | (b(j) & 0xFFL); j += 1 }
      while (j < 16) { v2 = (v2 << 8) | (b(j) & 0xFFL); j += 1 }
      // mix the two halves for the probe start; equality is on both
      var s = (java.lang.Long.hashCode(v1 * 0x9E3779B97F4A7C15L + v2)) & mask
      while (slotOcc(s) != 0 && (kh1(s) != v1 || kh2(s) != v2))
        s = (s + 1) & mask
      val p = i + 1 // 1-based code-point start
      if (slotOcc(s) == 0) {
        kh1(s) = v1; kh2(s) = v2; slotKey(s) = b
        slotOcc(s) = 1; slotMin(s) = p; slotMax(s) = p
        order(nd) = s; nd += 1
      } else {
        slotOcc(s) += 1
        if (p < slotMin(s)) slotMin(s) = p
        if (p > slotMax(s)) slotMax(s) = p
      }
      i += 1
    }
    val out = new Array[Any](nd)
    i = 0
    while (i < nd) {
      val s = order(i)
      out(i) = new GenericInternalRow(Array[Any](
        slotKey(s), slotOcc(s), slotMin(s), slotMax(s)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<struct<win:binary, n_occ:int, min_start:int, max_start:int>>`
  * — see [[WindowStats]].
  */
case class WindowStatsExpr(child: Expression, k: Int, seed: Long = 0L)
    extends UnaryExpression {
  require(k > 0, "window length k must be positive")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("win", BinaryType, nullable = false),
      org.apache.spark.sql.types.StructField("n_occ", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("min_start", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("max_start", org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WindowStats.stats(input.asInstanceOf[UTF8String], k, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WindowStats.stats($x, $k, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<binary>` of the distinct selected-window md5 digests of a
  * string under (k, w) winnowing — see [[WinnowedFp]] for the
  * selection contract and why emitting the digest (not the substring)
  * changes no downstream relation.
  */
case class WinnowedFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "window length k and winnow width w must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowedFp.winnowed(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.WinnowedFp.winnowed($x, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<binary>` of the 16-byte window fingerprints of a string —
  * see [[SubstringFp]] for the hash construction and collision
  * contract. `distinct = false` keeps window order (element i =
  * window at code point i); `distinct = true` emits each fingerprint
  * once, order unspecified (the per-doc dedup the pair algebra needs,
  * done in-pass instead of via `array_distinct`'s generic O(m²)
  * path).
  */
case class WindowFingerprintsExpr(child: Expression, k: Int,
    distinct: Boolean, seed: Long = 0L) extends UnaryExpression {
  require(k > 0, "window length k must be positive")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SubstringFp.fingerprints(input.asInstanceOf[UTF8String], k, distinct, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SubstringFp.fingerprints($x, $k, $distinct, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
