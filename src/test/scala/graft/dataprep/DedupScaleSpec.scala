package graft.dataprep

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-shape guarantees for the dedup pair generators: when the
  * corpus is too big to broadcast (simulated by disabling the
  * broadcast thresholds — a hint would override them, the hint-free
  * operators must not), the plans fall back to shuffled equi-joins,
  * never a forced BroadcastExchange / broadcast nested loop.
  */
class DedupScaleSpec extends SparkSpec {

  /** Run `f` with broadcast joins disabled (static + adaptive), i.e.
    * "every side is too big to broadcast". Restores the conf after.
    */
  private def noBroadcast[A](f: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def finalPlan(df: DataFrame): String = {
    df.collect() // finalize the adaptive plan before reading it
    df.queryExecution.executedPlan.toString
  }

  private def docs(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa run $i"
      (i.toLong, if (i % 2 == 1) base.replace("kappa", "kappa!") + s" ${i - 1}" else base + s" $i")
    }.toDF("doc_id", "text").withColumn("len", length(col("text")))
  }

  // The public pair wrappers checkpoint their results (their plans
  // are block scans), so the scale-shape contracts are asserted on
  // the LAZY inner plans the wrappers delegate to.

  test("ngramJaccardPairs plan has no broadcast when the corpus cannot broadcast") {
    noBroadcast {
      val s = Dedup.ngramShingles(docs(60), "doc_id", "text", "len", 8).persist()
      try {
        val plan = finalPlan(Dedup.ngramJaccardPairsFromShingles(s, 8, 1, 2))
        assert(!plan.contains("BroadcastExchange"), plan)
        assert(!plan.contains("BroadcastNestedLoop"), plan)
      } finally { s.unpersist(); () }
    }
  }

  test("simhashPairs plan has no broadcast when the corpus cannot broadcast") {
    noBroadcast {
      val s = Dedup.simhashSigs(docs(60), "doc_id", "text").persist()
      try {
        for (wide <- Seq(false, true)) {
          val plan = finalPlan(Dedup.simhashPairsFromSigs(s, 3, wide))
          assert(!plan.contains("BroadcastExchange"), plan)
          assert(!plan.contains("BroadcastNestedLoop"), plan)
        }
      } finally { s.unpersist(); () }
    }
  }

  test("simhashPairs wide (10-table block-pair) scheme is output-identical to the banded scheme") {
    val df = docs(60)
    val narrow = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // force the wide scheme through the public cutover conf
    spark.conf.set("spark.graft.dedup.simhashWideMin", "0")
    val wide = try Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    finally spark.conf.unset("spark.graft.dedup.simhashWideMin")
    assert(narrow.nonEmpty && wide == narrow,
      s"wide=${wide.size} narrow=${narrow.size}")
  }

  /** Deterministic unit-ish vectors: pairs (2k, 2k+1) are identical →
    * dot = |v|² ≥ threshold and LSH signatures collide on every band.
    */
  private def vecs(n: Int, dim: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val g = i / 2
      val raw = (0 until dim).map(j => math.sin(g * 31 + j * 7))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      (i.toLong, raw.map(x => (x / norm).toFloat).toArray)
    }.toDF("id", "embedding")
  }

  test("embeddingNearDupPairs LSH path: no broadcast nested loop, exact dups found") {
    val df = vecs(80, 16)
    // above the attach cap (broadcastAttach=false) NOTHING broadcasts:
    // the general 1e9-vector plan is shuffled equi-joins end to end
    noBroadcast {
      val s = Dedup.embeddingLshSigs(
        df.select(col("id"), col("embedding").cast("array<double>").as("v"))).persist()
      try {
        val plan = finalPlan(Dedup.embeddingLshPairsFromSigs(s, 0.9,
          broadcastAttach = false))
        assert(!plan.contains("BroadcastNestedLoop"), plan)
        assert(!plan.contains("BroadcastExchange"), plan)
        // below the cap the vector attach IS a deliberate broadcast
        // hash join (the sf10 disk-kill fix) — never a nested loop
        val bplan = finalPlan(Dedup.embeddingLshPairsFromSigs(s, 0.9,
          broadcastAttach = true))
        assert(bplan.contains("BroadcastHashJoin"), bplan)
        assert(!bplan.contains("BroadcastNestedLoop"), bplan)
      } finally { s.unpersist(); () }
    }
    // bruteForceMax=0 forces the banded-LSH plan regardless of size
    val lsh = Dedup.embeddingNearDupPairs(df, "id", "embedding", 0.9,
      bruteForceMax = 0L).collect()
    // identical-vector pairs share every band → recall 1 on them; the
    // brute path (the oracle-checked shape) is the reference
    val brute = Dedup.embeddingNearDupPairs(df, "id", "embedding", 0.9).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lshSet = lsh.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lshSet.subsetOf(bruteSet), "LSH path reported a pair brute force did not")
    val identical = (0 until 40).map(g => (2L * g, 2L * g + 1)).toSet
    assert(identical.forall(p => lshSet.exists(t => (t._1, t._2) == p)),
      "LSH path missed an identical-vector pair")
  }

  test("embeddingNearDupPairs below the cutover matches the documented brute shape") {
    val df = vecs(20, 8)
    val out = Dedup.embeddingNearDupPairs(df, "id", "embedding", 0.9)
    val plan = finalPlan(out)
    assert(plan.contains("BroadcastNestedLoop"), plan)
  }
}
