package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter over 64-bit hashes, held as ONE codegen reference
  * object (the [[IvfCentroids]] pattern) so probing stays inside
  * whole-stage codegen with no per-row allocation. Probe positions use
  * Kirsch–Mitzenmacher double hashing — g1 = h, g2 = splitmix64(h)|1,
  * pos_i = (g1 + i·g2) masked to the power-of-two bit domain — so the
  * filter is a pure function of the inserted hash set and its
  * (numBits, numHashes) shape: rebuildable bit-for-bit anywhere.
  *
  * The scale story: an eval benchmark's distinct-shingle set at 10^8
  * entries costs GBs as a broadcast join relation but ~hundreds of MB
  * as bits at ~10 bits/key — and probing is a handful of cache-line
  * reads per shingle instead of join machinery. False positives only
  * (never misses a true member): for decontamination that errs toward
  * dropping a little more, never toward leaking a benchmark doc.
  */
final class LongBloom(val bits: Array[Long], val numHashes: Int)
    extends Serializable {
  require(bits.length > 0 && (bits.length & (bits.length - 1)) == 0,
    "bits word count must be a power of two")
  require(numHashes >= 1 && numHashes <= 16, "numHashes must be in [1,16]")
  private val mask: Long = bits.length.toLong * 64L - 1L

  def add(h: Long): Unit = LongBloom.set(bits, numHashes, h)

  def mightContain(h: Long): Boolean = {
    val g2 = LongBloom.mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h + i.toLong * g2) & mask
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def merge(other: LongBloom): LongBloom = {
    require(other.bits.length == bits.length && other.numHashes == numHashes,
      "bloom shapes differ")
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  /** Count of array elements that probe positive — the map-side
    * overlap upper bound. */
  def overlapCount(hs: ArrayData): Long = {
    var n = 0L
    var i = 0
    val len = hs.numElements()
    while (i < len) {
      if (mightContain(hs.getLong(i))) n += 1L
      i += 1
    }
    n
  }
}

object LongBloom {
  /** splitmix64 finalizer (same constants as [[SeqAggregates.mix64]]'s
    * mixing steps; seedless — this stream only decorrelates g2 from
    * g1, it is not a sampling priority). */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  def empty(numBits: Int, numHashes: Int): LongBloom = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      "numBits must be a power of two >= 64")
    new LongBloom(new Array[Long](numBits / 64), numHashes)
  }

  /** OR `h`'s probe positions into a raw word array (allocation-free
    * reduce step for distributed bloom builds; same position math as
    * [[LongBloom.add]] — words length must be a power of two). */
  def set(bits: Array[Long], numHashes: Int, h: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val g2 = mix(h) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = (h + i.toLong * g2) & mask
      bits((pos >>> 6).toInt) |= (1L << (pos & 63L))
      i += 1
    }
  }
}

/** Count of `child`'s array<long> elements that probe positive in the
  * bloom — the whole decontamination overlap test as one codegen'd
  * scalar: no explode, no join, no shuffle.
  */
case class BloomOverlapCountExpr(child: Expression, bloom: LongBloom)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_overlap_count expects array<long>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    bloom.overlapCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("longBloom", bloom,
      classOf[LongBloom].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.overlapCount($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def bloomOverlapCount(hashes: Column, bloom: LongBloom): Column =
    ColumnBridge.column(BloomOverlapCountExpr(ColumnBridge.expression(hashes), bloom))
}
