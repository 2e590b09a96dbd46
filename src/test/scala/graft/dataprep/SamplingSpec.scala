package graft.dataprep

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0L until 1000L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")

  test("split is deterministic, partition-independent, and ~weight-proportional") {
    val a = Sampling.split(df, "id").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.split(df.repartition(13, col("grp")), "id").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) < 60)
    assert(math.abs(counts("val") - 100) < 40)
    assert(math.abs(counts("test") - 100) < 40)
    // membership is per-row stable: a subset of the data splits identically
    val sub = Sampling.split(df.where(col("id") < 100), "id").select("id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (id, s) => a(id) == s })
  }

  test("weightedMix: per-group rates, nested samples, keep-all and default paths") {
    def kept(rates: Map[String, Double], default: Double): Set[Long] =
      Sampling.weightedMix(df, "id", "grp", rates, default)
        .select("id").collect().map(_.getLong(0)).toSet
    val all = kept(Map("g0" -> 1.0), 1.0)
    assert(all.size == 1000) // rate 1.0 keeps everything (no threshold edge)
    val half = kept(Map("g0" -> 0.5), 0.0)
    val quarter = kept(Map("g0" -> 0.25), 0.0)
    // only g0 survives a 0.0 default
    assert(half.forall(_ % 3 == 0) && quarter.forall(_ % 3 == 0))
    // nested: raising the rate only adds rows, never swaps them
    assert(quarter.subsetOf(half))
    assert(math.abs(half.size - 334 / 2) < 40)
    // partition-independence: same selection on a reshuffled frame
    val again = Sampling.weightedMix(df.repartition(11, col("grp")),
      "id", "grp", Map("g0" -> 0.5), 0.0).select("id").collect().map(_.getLong(0)).toSet
    assert(again == half)
    // groups without an explicit rate use the default
    val mixed = kept(Map("g1" -> 1.0), 0.5)
    assert(mixed.count(_ % 3 == 1) == 333) // every g1 row (ids 1,4,...,997)
    assert(mixed.filter(_ % 3 == 0) == half.filter(_ % 3 == 0)) // g0 at default 0.5 = explicit 0.5
  }

  test("weightedMix composes independently with split (distinct salts)") {
    // with a shared hash this degenerates: 25% mix survivors all have
    // h63 < 0.25*2^63 < train's 0.8*2^63 bound → everything 'train'
    val mixed = Sampling.weightedMix(df, "id", "grp", Map.empty, 0.25)
    val counts = Sampling.split(mixed, "id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0,
      s"mix survivors must still split three ways, got $counts")
    val n = counts.values.sum
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.1)
  }

  test("stratifiedSample keeps exactly k smallest priorities per group") {
    val s = Sampling.stratifiedSample(df, "grp", "id", k = 10)
      .select("grp", "sample_rank", "id").collect()
    assert(s.length == 30)
    val byG = s.groupBy(_.getString(0))
    assert(byG.keySet == Set("g0", "g1", "g2") && byG.values.forall(_.length == 10))
    // re-running on a reshuffled frame returns the identical sample
    val s2 = Sampling.stratifiedSample(df.repartition(7), "grp", "id", k = 10)
      .select("grp", "sample_rank", "id").collect()
    assert(s.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      s2.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("deterministicShuffle: a permutation, stable across partitionings, salt-sensitive") {
    val a = Sampling.deterministicShuffle(df, "id")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a.toSet == (0L until 1000L).toSet) // permutation, nothing lost
    assert(a != (0L until 1000L).toSeq)       // actually shuffled
    val b = Sampling.deterministicShuffle(df.repartition(17), "id")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b) // identical order regardless of physical layout
    val c = Sampling.deterministicShuffle(df, "id", salt = 42L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(a != c) // a different epoch salt is a different order
  }
}
