package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the hot vector/set paths. The
  * higher-order-function formulations (`aggregate(zip_with(...))`)
  * allocate an intermediate array per row pair — at millions of pairs
  * that's the dominant cost. These generate a tight primitive loop
  * inside whole-stage codegen instead (builder-prompt preference (b):
  * custom Expression over UDF).
  */

/** dot(a, b) over array<double>, accumulating left-to-right — the same
  * order as an ordered fold / DuckDB's list_dot_product, so results are
  * bit-identical to the HOF formulation it replaces.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Two-pointer sorted difference of a row's sorted-distinct long array
  * against a fixed sorted `drop` array shipped inside the plan (the
  * reference-object pattern [[BloomOverlapCountExpr]] uses for its
  * bitset). Keeps stop-shingle filtering inside whole-stage codegen —
  * no explode, no window, no anti-join shuffle.
  */
object SortedDiffKernel {
  def diff(xs: ArrayData, drop: Array[Long]): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Long](n)
    var i = 0
    var j = 0
    var w = 0
    while (i < n) {
      val v = xs.getLong(i)
      while (j < drop.length && drop(j) < v) j += 1
      if (j >= drop.length || drop(j) != v) { out(w) = v; w += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, w))
  }
}

case class SortedDiffExpr(child: Expression, drop: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_diff expects array<bigint>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SortedDiffKernel.diff(input.asInstanceOf[ArrayData], drop)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sortedDrop", drop, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SortedDiffKernel.diff($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of common elements between two arrays of distinct sorted
  * longs — a two-pointer merge instead of array_intersect's per-row
  * hash-set build. Inputs MUST be sorted ascending and duplicate-free
  * (use array_sort(array_distinct(...)) upstream, or hashes of a
  * distinct set sorted once per row).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0
    var j = 0
    var c = 0L
    val n = x.numElements()
    val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $n = $a.numElements(); int $m = $b.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash permutation coefficients, splitmix64-mixed per index.
  *
  * The original scheme derived a_i, b_i LINEARLY from i
  * (a_i = ((i+1)·C1) mod P, b_i = ((i+1)·C2) mod P), which makes the
  * "independent permutations" affinely correlated:
  * h_i(x) ≡ (i+1)·(C1·xm + C2) + xm (mod P) — a single element can be
  * the minimum on an ARITHMETIC PROGRESSION of permutation indices.
  * The round-9 sf1 rehearsal caught exactly that: one document's
  * unique shingle won every i ≡ 2 (mod 4), i.e. one row in EVERY
  * 4-row band, so a J=0.91 near-duplicate pair shared 0 of 32 bands
  * and its whole cluster split. splitmix64 (Steele et al.,
  * "Fast splittable pseudorandom number generators", OOPSLA'14 —
  * finalizer constants public domain) decorrelates the streams; the
  * per-numHashes coefficient arrays are cached so row evaluation cost
  * is unchanged.
  */
object MinHashCoefficients {
  val P = 2147483647L

  /** Bumped whenever the permutation family changes (v1 = the linear
    * scheme above, v2 = splitmix64). Persisted band-key indexes embed
    * this so a probe with a different family fails loudly instead of
    * silently finding nothing ([[graft.dataprep.Dedup.buildMinhashIndex]]). */
  val familyVersion = 2

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  /** (a, b) arrays for `numHashes` permutations; a_i ∈ [1, P−1]. */
  def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    cache.computeIfAbsent(numHashes, n => {
      val a = new Array[Long](n)
      val b = new Array[Long](n)
      var i = 0
      while (i < n) {
        a(i) = ((mix64(2L * i) % (P - 1)) + (P - 1)) % (P - 1) + 1
        b(i) = ((mix64(2L * i + 1) % P) + P) % P
        i += 1
      }
      (a, b)
    })
}

/** MinHash signature in one pass: given an array of shingle hashes,
  * produce `numHashes` minima of h_i(x) = (a_i * (x mod P) + b_i) mod P,
  * P = 2^31 − 1, with a_i/b_i from [[MinHashCoefficients]]
  * (splitmix64-decorrelated — see the pathology note there). Replaces
  * a nested higher-order-function formulation that allocated an
  * intermediate array per permutation per row.
  */
case class MinHashSignatureExpr(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val P = MinHashCoefficients.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val (ca, cb) = MinHashCoefficients.coeffs(numHashes)
    val n = xs.numElements()
    val out = Array.fill(numHashes)(P)
    var k = 0
    while (k < n) {
      val x = xs.getLong(k)
      val xm = ((x % P) + P) % P
      var i = 0
      while (i < numHashes) {
        val v = (ca(i) * xm + cb(i)) % P
        if (v < out(i)) out(i) = v
        i += 1
      }
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val xm = ctx.freshName("xm")
      val v = ctx.freshName("v")
      val co = ctx.freshName("coeffs")
      s"""
         |scala.Tuple2<long[], long[]> $co =
         |  graft.functions.MinHashCoefficients.coeffs($numHashes);
         |int $n = $x.numElements();
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, ${P}L);
         |for (int $k = 0; $k < $n; $k++) {
         |  long $xm = (($x.getLong($k) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = (((long[]) $co._1())[$i] * $xm + ((long[]) $co._2())[$i]) % ${P}L;
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash signature + LSH band keys in one pass: compute the
  * `numHashes` permutation minima (same scheme as
  * [[MinHashSignatureExpr]]), then fold each band's r = numHashes/bands
  * consecutive signature values (plus the band index) into one 64-bit
  * key. Replaces a transform/xxhash64/try_element_at expression forest —
  * any deterministic mixing works here, because a band-key collision
  * only adds a candidate pair that exact verification rejects.
  */
case class MinHashBandKeysExpr(child: Expression, numHashes: Int, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numHashes % bands == 0, "bands must divide numHashes")

  private val P = MinHashCoefficients.P

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val (ca, cb) = MinHashCoefficients.coeffs(numHashes)
    val n = xs.numElements()
    val sig = Array.fill(numHashes)(P)
    var k = 0
    while (k < n) {
      val xm = ((xs.getLong(k) % P) + P) % P
      var i = 0
      while (i < numHashes) {
        val v = (ca(i) * xm + cb(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      k += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L + b
      var j = 0
      while (j < r) {
        h = h * 31 + sig(b * r + j)
        j += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val xm = ctx.freshName("xm"); val v = ctx.freshName("v")
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val co = ctx.freshName("coeffs")
      val r = numHashes / bands
      s"""
         |scala.Tuple2<long[], long[]> $co =
         |  graft.functions.MinHashCoefficients.coeffs($numHashes);
         |int $n = $x.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, ${P}L);
         |for (int $k = 0; $k < $n; $k++) {
         |  long $xm = (($x.getLong($k) % ${P}L) + ${P}L) % ${P}L;
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = (((long[]) $co._1())[$i] * $xm + ((long[]) $co._2())[$i]) % ${P}L;
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = 1125899906842597L + $b;
         |  for (int $j = 0; $j < $r; $j++) $h = $h * 31L + $sig[$b * $r + $j];
         |  $out[$b] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash from an array of element hashes in one pass: per bit
  * position sum +1/−1 over elements, keep the sign bit. Replaces a
  * 64-aggregate-traversal HOF formulation.
  */
case class SimHash64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val counters = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h = xs.getLong(k)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counters(i) += 1 else counters(i) -= 1
        i += 1
      }
      k += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counters(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val counters = ctx.freshName("counters")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |int[] $counters = new int[64];
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $x.getLong($k);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $counters[$i]++; else $counters[$i]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counters[$i] > 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash variant whose every step is expressible in portable ANSI-ish
  * SQL, so the result can be cross-checked bit-for-bit by an external
  * engine (DuckDB oracle): token base hash = polynomial-31 over Unicode
  * code points mod P = 2^31−1 (seed 7); per bit b an affine mix
  * g = (A_b·h + C_b) mod P votes +1 when 2g < P; majority sign forms the
  * 64-bit hash. Input: array<string> (distinct tokens), output: long.
  */
case class SimHashPortable64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableSimHash.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PortableSimHash.simhash($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The SQL-portable string base hash on its own: polynomial-31 over
  * Unicode code points mod P = 2^31−1, seed 7 — the same
  * [[PortableSimHash.hashToken]] the simhash uses, exposed for
  * operators that need a replayable per-value hash (KMV distinct
  * sketch). Input: string, output: long in [0, P).
  */
case class PortableHashExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PortableSimHash.hashToken(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.PortableSimHash.hashToken($x.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PortableSimHash {
  val P = 2147483647L
  private val C1 = ((0x9E3779B97F4A7C15L % P) + P) % P
  private val C2 = ((0xC2B2AE3D27D4EB4FL % P) + P) % P

  def aCoef(b: Int): Long = ((2L * b + 1L) * C1) % P
  def cCoef(b: Int): Long = ((b + 1L) * C2) % P
  private val A = Array.tabulate(64)(aCoef)
  private val C = Array.tabulate(64)(cCoef)

  /** poly-31 over Unicode code points, mod P, seed 7 — mirrors the
    * DuckDB `list_reduce(list_prepend(7, [unicode(t[i]) ...]), ...)`
    * oracle formulation exactly.
    */
  def hashToken(s: String): Long = {
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counters = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h = hashToken(tokens.getUTF8String(k).toString)
      var b = 0
      while (b < 64) {
        val g = (A(b) * h + C(b)) % P
        if (2 * g < P) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      k += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Random-hyperplane LSH bucket id over array<double>, with the plane
  * components cached per (nBits, dim) instead of re-deriving 768 hashes
  * per row. Components replicate the HOF formulation exactly:
  * ((xxhash64(p, j) pmod 1e6) / 1e6) - 0.5 with Spark's seed-42 chained
  * int hashing, so bucket ids are bit-identical to the original.
  */
case class LshBucketsExpr(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    LshPlanes.bucket(v, nBits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.LshPlanes.bucket($x, $nBits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshPlanes {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def hashInt(i: Int, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      i, org.apache.spark.sql.types.IntegerType, seed)

  /** Integer pre-images of the plane components (component =
    * m/1e6 − 0.5). Exposed so an external oracle can rebuild the exact
    * plane doubles with its own (identical, IEEE) arithmetic.
    */
  def planeInts(nBits: Int, dim: Int): Array[Array[Long]] =
    Array.tabulate(nBits, dim) { (p, j) =>
      val h = hashInt(j, hashInt(p, 42L))
      ((h % 1000000L) + 1000000L) % 1000000L
    }

  def planes(nBits: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((nBits, dim), { _ =>
      planeInts(nBits, dim).map(_.map(m => m.toDouble / 1000000.0 - 0.5))
    })

  def bucket(v: ArrayData, nBits: Int): Long = {
    val dim = v.numElements()
    val ps = planes(nBits, dim)
    var out = 0L
    var p = 0
    while (p < nBits) {
      val plane = ps(p)
      var acc = 0.0
      var j = 0
      while (j < dim) {
        acc += v.getDouble(j) * plane(j)
        j += 1
      }
      if (acc > 0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** Precomputed centroid matrix for IVF cell assignment. Held as ONE
  * runtime object (codegen reference) instead of unrolled per-component
  * literals: the generated code is identical for every centroid set, so
  * consecutive Lloyd iterations hit the Janino codegen cache instead of
  * recompiling a 1000-literal expression tree per step.
  * |c|² is an ordered left-to-right fold, matching the driver-side fold
  * the literal formulation used (and the oracle's replay).
  */
final class IvfCentroids(val cells: Array[Long], val vecs: Array[Array[Double]])
    extends Serializable {
  val norms2: Array[Double] = vecs.map { cv =>
    var acc = 0.0; var i = 0
    while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
    acc
  }
}

object IvfCells {
  /** Cell ids sorted by (squared distance asc, cell asc). dist =
    * |c|² − 2·v·c (|v|² dropped: constant per row). The comparison is
    * IEEE (`<`), so a -0.0/0.0 tie falls through to the cell id, the
    * same total order SQL engines produce — bit-compatible with the
    * previous array_sort(struct(dist, cell)) formulation.
    */
  def nearestCells(v: ArrayData, c: IvfCentroids): ArrayData = {
    val k = c.cells.length
    val dists = new Array[Double](k)
    var p = 0
    while (p < k) {
      val cv = c.vecs(p)
      val n = math.min(v.numElements(), cv.length)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += v.getDouble(j) * cv(j); j += 1 }
      dists(p) = c.norms2(p) - 2.0 * acc
      p += 1
    }
    // insertion-sort the index permutation by (dist, cell): k is small
    // (16-4096 cells) and the input is nearly unordered anyway
    val idx = Array.tabulate(k)(identity)
    var i = 1
    while (i < k) {
      val cur = idx(i)
      var j2 = i - 1
      while (j2 >= 0 && {
        val a = idx(j2)
        dists(a) > dists(cur) ||
          (!(dists(a) < dists(cur)) && c.cells(a) > c.cells(cur))
      }) { idx(j2 + 1) = idx(j2); j2 -= 1 }
      idx(j2 + 1) = cur
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      idx.map(c.cells(_)))
  }
}

/** Sorted-by-distance centroid cell ids for a vector (see [[IvfCells]]).
  * The centroid matrix rides along as a reference object, not as
  * literals — stable generated code across training iterations.
  */
case class NearestCellsExpr(child: Expression, centroids: IvfCentroids)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    IvfCells.nearestCells(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCentroids", centroids,
      classOf[IvfCentroids].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.IvfCells.nearestCells($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** A fixed double matrix carried into generated code as ONE reference
  * object (like [[IvfCentroids]]) — the broadcast-side operand of
  * [[MaxDotExpr]]. */
final class DotMatrix(val rows: Array[Array[Double]]) extends Serializable

object DotMatrix {
  /** Max over the matrix rows of the row·v dot product — per-element
    * accumulation order identical to [[DotProductExpr]], so results
    * are bit-equal to a join + per-pair dot + MAX formulation,
    * INCLUDING the NaN case: Spark's `max` treats NaN as the greatest
    * double, so any NaN dot product makes the whole max NaN here too
    * (and the scan short-circuits — NaN is absorbing for max). Empty
    * matrix → -Infinity (callers guard). */
  def maxDot(v: org.apache.spark.sql.catalyst.util.ArrayData, m: DotMatrix): Double = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = v.getDouble(i); i += 1 }
    var best = Double.NegativeInfinity
    var r = 0
    while (r < m.rows.length) {
      val row = m.rows(r)
      val d = math.min(n, row.length)
      var s = 0.0
      var j = 0
      while (j < d) { s += x(j) * row(j); j += 1 }
      if (java.lang.Double.isNaN(s)) return Double.NaN
      if (s > best) best = s
      r += 1
    }
    best
  }
}

/** Max dot product of a vector column against a FIXED matrix — the
  * map-side decontamination kernel: ONE corpus scan inside whole-stage
  * codegen instead of a |corpus|×|bench| join fan-out plus a re-
  * aggregation keyed by id (the r11 sf1 bench measured the join form
  * at 22.8 s for 19k×1k rows; this form is a single pass). The right
  * 100 TB shape when the matrix side is MBs: the corpus neither
  * shuffles nor multiplies its row count.
  */
case class MaxDotExpr(child: Expression, matrix: DotMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_dot expects array<double>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    DotMatrix.maxDot(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotMatrix", matrix, classOf[DotMatrix].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DotMatrix.maxDot($x, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** splitmix64 of a long uid (graft.functions.SeqAggregates.mix64) as a
  * native expression — Java long arithmetic wraps, which ANSI-mode
  * Column operators would reject as overflow. The same arithmetic is
  * replayable in the DuckDB oracle via HUGEINT mod-2^64 steps.
  */
case class Mix64Expr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mix64 expects bigint, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SeqAggregates.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.SeqAggregates.mix64($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization + SIMPLE per-codepoint case folding.
  * Spark has no NFC builtin, and its `lower` delegates to Java's
  * contextual, locale-sensitive toLowerCase (final-sigma handling,
  * Turkish-locale dotted I) — not byte-equivalent to other engines.
  * This kernel applies java.text.Normalizer NFC then
  * Character.toLowerCase per code point: the Unicode SIMPLE lowercase
  * mapping, context-free and locale-free, matching utf8proc-based
  * engines (the DuckDB oracle's `lower(nfc_normalize(x))`).
  */
case class NfcFoldExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_fold expects string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      NfcFold.fold(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.functions.NfcFold.fold($x.toString()));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcFold {
  def fold(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

object VectorExpressions {
  def mix64(uid: Column): Column =
    ColumnBridge.column(Mix64Expr(ColumnBridge.expression(uid)))

  def nfcFold(s: Column): Column =
    ColumnBridge.column(NfcFoldExpr(ColumnBridge.expression(s)))

  def lshBuckets(vec: Column, nBits: Int): Column =
    ColumnBridge.column(LshBucketsExpr(ColumnBridge.expression(vec), nBits))

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def maxDot(v: Column, rows: Array[Array[Double]]): Column =
    ColumnBridge.column(MaxDotExpr(ColumnBridge.expression(v), new DotMatrix(rows)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedDiff(a: Column, drop: Array[Long]): Column =
    ColumnBridge.column(SortedDiffExpr(ColumnBridge.expression(a), drop))

  def minhashSignature(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignatureExpr(ColumnBridge.expression(hashes), numHashes))

  def minhashBandKeys(hashes: Column, numHashes: Int, bands: Int): Column =
    ColumnBridge.column(MinHashBandKeysExpr(ColumnBridge.expression(hashes), numHashes, bands))

  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(hashes)))

  def simhashPortable64(tokens: Column): Column =
    ColumnBridge.column(SimHashPortable64Expr(ColumnBridge.expression(tokens)))

  def portableHash(s: Column): Column =
    ColumnBridge.column(PortableHashExpr(ColumnBridge.expression(s)))

  def nearestCells(vec: Column, centroids: Seq[(Long, Seq[Double])]): Column =
    ColumnBridge.column(NearestCellsExpr(ColumnBridge.expression(vec),
      new IvfCentroids(centroids.map(_._1).toArray, centroids.map(_._2.toArray).toArray)))
}
