package graft.engine

import graft.SparkSpec
import graft.tables.TestTables

/** The quantile auto-route (SeqEngine.aggregateQuantileAuto): exact
  * window-rank ANSWERS when every bucket fits the cap; the bounded-
  * memory bottom-k sketch above it. For caps at or below the sketch's
  * sample bound the route is a single aggregation pass (the sketch's
  * complete-below-cap sample IS the exact answer) — no probe, and the
  * plan must carry NO per-group window sort (the skew-fragile shape at
  * scale). Only a cap above the sample bound pays for the probe.
  */
class QuantileRouteSpec extends SparkSpec {

  private def engine = new SeqEngine(TestTables.eventsDocs(spark, sfDir))
  private val agg = AggRequest(
    AggFunc.Quantile(Seq(0.5, 0.9)), field = "value", groupBy = Some("event_type"))
  private val (t0, t31) = (1704067200000L, 1706745599999L)

  test("above the cap the routed plan has no window sort") {
    val out = engine.aggregateQuantileAuto("*", t0, t31, agg, cap = 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("RunningWindowFunction"), plan)
  }

  test("below the cap the routed result is the exact window path") {
    val exact = engine.aggregateOver(engine.matches("*", t0, t31), agg)
    val routed = engine.aggregateQuantileAuto("*", t0, t31, agg, cap = Long.MaxValue)
    assert(routed.collect().toSeq == exact.collect().toSeq)
  }

  test("above the cap the routed result equals the sketch path") {
    val sketch = engine.aggregateQuantileSketch("*", t0, t31, agg).collect().toSeq
    val routed = engine.aggregateQuantileAuto("*", t0, t31, agg, cap = 10L).collect().toSeq
    assert(routed == sketch)
  }

  test("the default cap routes in one pass: no window sort, no probe cache") {
    val out = engine.aggregateQuantileAuto("*", t0, t31, agg)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // single-pass: nothing persisted by the route (the old probe left a
    // MEMORY_AND_DISK frame in the CacheManager for its lifetime)
    assert(!plan.contains("InMemoryTableScan"), plan)
  }

  test("aggregate() dispatches quantiles through the auto-route") {
    // at sf0.001 every bucket is far below the default cap, so the
    // dispatch must reproduce the exact path bit-for-bit
    val viaAggregate = engine.aggregate("*", t0, t31, agg).collect().toSeq
    val exact = engine.aggregateOver(engine.matches("*", t0, t31), agg).collect().toSeq
    assert(viaAggregate == exact)
  }
}
