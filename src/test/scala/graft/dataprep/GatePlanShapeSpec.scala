package graft.dataprep

import graft.{SparkEntry, SparkSpec}

/** Blanket plan-shape guardrail over the WHOLE dp_* gate map: at scale
  * settings (embedding brute/LSH cutover forced to the LSH path, no
  * automatic broadcasts) no data-prep query may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where
  * the broadcast side is bounded by construction (a handful of query
  * vectors, a top-k pool) — the shapes that stay correct at 10^9 docs.
  * Extends the per-op assertions in [[DedupScaleSpec]] to every gate
  * entry, compositions included, so a future edit that sneaks a
  * corpus×corpus nested loop into any dp_* plan fails here.
  */
class GatePlanShapeSpec extends SparkSpec {

  // BNLJ whose broadcast side is KB-bounded by construction: brute-force
  // scoring against an explicit handful of query ids (the 10^9-corpus
  // plan for these is precisely "broadcast the k queries, scan once"),
  // or fusion/re-rank over TakeOrdered pools of <= 2·poolK rows.
  private val boundedBnljOk: Set[String] = Set(
    "dp_ann_topk",        // 5 query vectors broadcast over the corpus scan
    "dp_hard_negatives",  // same, with the per-query label exclusion
    "dp_triplet_mine",    // same scored scan, split into pos/neg windows
    "dp_ann_filtered",    // same, with a pushed predicate
    "dp_ann_int8",        // same over the quantized corpus
    "dp_ann_int8_rerank", // stage 1 int8 scan + stage 2 rerank of top-3k pool
    "dp_ann_lsh",         // bucket-pruned scan, still k queries broadcast
    "dp_ann_ivf",         // probed-cell scan, k queries broadcast
    "dp_ann_ivf_indexed", // same over the prebuilt cell index
    "dp_ann_pq",          // 5 query LUTs (m·kSub longs each) broadcast
    "dp_ann_pq_rerank",   // + stage-2 rerank of the top-40 shortlist
    "dp_mmr",             // greedy re-rank over a TakeOrdered pool
    "dp_hybrid_rrf",      // RRF fusion of two <= poolK rank lists
    "dp_decontaminate_embed", // bench-centroid (k rows) probe vs corpus
    "dp_temperature_mix", // the 1-row global-min frame crossed into the
                          // #groups-sized counts frame (never the corpus)
    "dp_stream_sessionize" // the 1-row max(mid) frame crossed into the
                           // session sink to drop sentinel-flush rows
  )

  test("no dp_* gate query plans a cartesian product or an unbounded nested loop at scale settings") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.graft.dedup.bruteForceMax")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.graft.dedup.bruteForceMax", "0") // force the LSH path
    try {
      val failures = SparkEntry.queries.keys.toSeq.sorted
        .filter(_.startsWith("dp_"))
        .flatMap { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.collect() // finalize the adaptive plan before reading it
          val plan = df.queryExecution.executedPlan.toString
          val cartesian = plan.contains("CartesianProduct")
          val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
            !boundedBnljOk(name)
          if (cartesian || bnlj)
            Some(s"$name: cartesian=$cartesian unboundedBnlj=$bnlj")
          else None
        }
      assert(failures.isEmpty, failures.mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("no seq_*/events_*/tpch_* gate query plans a cartesian product either") {
    // same sweep over the log-engine and TPC-H families: these are
    // equi-join/window/scan plans by construction, so NO nested-loop
    // allowance at all — any CartesianProduct or BNLJ is a regression
    val failures = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("dp_"))
      .flatMap { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        val bad = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        if (bad) Some(name) else None
      }
    assert(failures.isEmpty, failures.mkString(", "))
  }
}
