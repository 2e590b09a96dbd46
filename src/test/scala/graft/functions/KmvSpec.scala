package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def h63(v: String): Long =
    SeqAggregates.mix64(PortableSimHash.hashToken(v)) >>> 1

  private def sketch(values: Seq[String], k: Int): Long =
    values.toDF("v")
      .select(shiftrightunsigned(
        VectorExpressions.mix64(VectorExpressions.portableHash(col("v"))), 1).as("h"))
      .as[Long]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(SeqAggregates.kmvAgg(k).toColumn)
      .collect().head._2

  test("exact below the cap (duplicates collapse)") {
    val vs = Seq("a", "b", "c", "a", "b", "a")
    assert(sketch(vs, 8) == 3L)
  }

  test("above the cap: the standard KMV estimate from the k-th smallest hash") {
    val vs = (0 until 500).map(i => s"v$i")
    val k = 16
    val kth = vs.map(h63).distinct.sorted.apply(k - 1)
    val expected = ((BigInt(k - 1) * BigInt(Long.MaxValue)) / BigInt(kth)).toLong
    assert(sketch(vs, k) == expected)
    // sane accuracy for k=16 (stddev ~ n/sqrt(k-2) → be generous)
    assert(math.abs(expected - 500.0) / 500.0 < 0.6)
  }

  test("partition- and order-independent") {
    val vs = (0 until 300).map(i => s"u${i % 211}") // dups + >k distinct
    val base = sketch(vs, 32)
    val shuffled = scala.util.Random.shuffle(vs)
    val viaPartitions = shuffled.toDF("v")
      .repartition(13)
      .select(shiftrightunsigned(
        VectorExpressions.mix64(VectorExpressions.portableHash(col("v"))), 1).as("h"))
      .as[Long]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(SeqAggregates.kmvAgg(32).toColumn)
      .collect().head._2
    assert(viaPartitions == base)
  }
}
