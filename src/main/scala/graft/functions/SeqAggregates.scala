package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable one-pass stats sketch mirroring the reference's
  * SamplesContainer (seq/qpr.go:316-415): min/max/sum/count/notExists
  * plus a bounded reservoir sample (cap 8096, RNG seed 73) from which
  * discrete quantiles are read at `round(q * (n-1))` of the sorted
  * sample (seq/qpr.go:345-364; q=0 → min, q=1 → max).
  *
  * This is the at-scale aggregation path: per-partition partial
  * buffers merge associatively (classic partial+final agg), memory is
  * bounded per group regardless of group size. The engine's exact
  * window-based quantile is preferred when the data fits; this sketch
  * replicates the reference's accuracy envelope instead.
  */
object SeqAggregates {

  val ReservoirCap = 8096
  val Seed = 73L

  final case class StatsBuf(
      var min: Double, var max: Double, var sum: Double,
      var total: Long, var notExists: Long,
      var seen: Long, // values offered to the reservoir
      var samples: Array[Double])

  final case class StatsResult(
      min: Double, max: Double, sum: Double, avg: Double,
      total: Long, notExists: Long, quantiles: Array[Double])

  /** Discrete quantile from a sorted sample: index round(q*(n-1)). */
  def quantileOf(sorted: Array[Double], q: Double): Double = {
    if (sorted.isEmpty) return Double.NaN
    if (q <= 0) return sorted.head
    if (q >= 1) return sorted.last
    val idx = math.round(q * (sorted.length - 1)).toInt
    sorted(math.min(idx, sorted.length - 1))
  }

  /** Aggregator over a nullable value column (null = field missing →
    * NotExists, aggregator.go:160-233 `_not_exists` accounting). */
  final class SamplesAgg(quantiles: Seq[Double])
      extends Aggregator[Option[Double], StatsBuf, StatsResult] {

    override def zero: StatsBuf =
      StatsBuf(Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0L, 0L, 0L,
        Array.empty[Double])

    private def offer(b: StatsBuf, v: Double): Unit = {
      b.seen += 1
      if (b.samples.length < ReservoirCap) {
        b.samples = b.samples :+ v
      } else {
        // Vitter's algorithm R with a deterministic RNG derived from
        // (seed, seen) so results don't depend on JVM object identity.
        val r = new java.util.Random(Seed ^ (b.seen * 0x9E3779B97F4A7C15L))
        val j = (r.nextDouble() * b.seen).toLong
        if (j < ReservoirCap) b.samples(j.toInt) = v
      }
    }

    override def reduce(b: StatsBuf, in: Option[Double]): StatsBuf = in match {
      case None => b.notExists += 1; b
      case Some(v) =>
        b.total += 1
        b.sum += v
        if (v < b.min) b.min = v
        if (v > b.max) b.max = v
        offer(b, v)
        b
    }

    override def merge(a: StatsBuf, c: StatsBuf): StatsBuf = {
      a.total += c.total
      a.notExists += c.notExists
      a.sum += c.sum
      if (c.min < a.min) a.min = c.min
      if (c.max > a.max) a.max = c.max
      // sample-merge: concatenate then cap (reference MergeSamples,
      // seq/qpr.go:366-387 keeps at most cap samples after merge)
      val combined = a.samples ++ c.samples
      a.samples =
        if (combined.length <= ReservoirCap) combined
        else {
          // deterministic downsample: take every k-th of the sorted pool
          val sorted = combined.sorted
          Array.tabulate(ReservoirCap) { i =>
            sorted(((i.toLong * sorted.length) / ReservoirCap).toInt)
          }
        }
      a.seen += c.seen
      a
    }

    override def finish(b: StatsBuf): StatsResult = {
      val sorted = b.samples.sorted
      StatsResult(
        min = if (b.total == 0) Double.NaN else b.min,
        max = if (b.total == 0) Double.NaN else b.max,
        sum = b.sum,
        avg = if (b.total == 0) Double.NaN else b.sum / b.total,
        total = b.total,
        notExists = b.notExists,
        quantiles = quantiles.map(q => quantileOf(sorted, q)).toArray)
    }

    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[StatsResult] = Encoders.product[StatsResult]
  }

  def samplesAgg(quantiles: Seq[Double]): SamplesAgg = new SamplesAgg(quantiles)
}
