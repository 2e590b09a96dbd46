package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-clock tests of the hystrix-style state machine:
  * closed → open on error-rate over volume, fail-fast while open,
  * single half-open probe, close-on-success / re-open-on-failure.
  */
class CircuitBreakerSpec extends AnyFunSuite {

  private def mk(volume: Int = 4, pct: Int = 50, sleepMs: Long = 1000L) = {
    var now = 0L
    val cb = new CircuitBreaker(
      requestVolumeThreshold = volume, errorThresholdPercentage = pct,
      numBuckets = 10, bucketWidthMs = 100L, sleepWindowMs = sleepMs,
      clock = () => now)
    (cb, (t: Long) => { now = t })
  }

  private def fail(cb: CircuitBreaker): Boolean =
    try { cb.run(throw new RuntimeException("boom")); false }
    catch {
      case _: RuntimeException => true
    }

  test("opens only once error rate crosses the threshold over the volume floor") {
    val (cb, _) = mk(volume = 4, pct = 50)
    // three failures: under the volume floor, still closed
    (1 to 3).foreach(_ => fail(cb))
    assert(!cb.isOpen)
    cb.run(42)
    assert(!cb.isOpen) // 3 fail / 4 total = 75% but run #4 succeeded -> 3/4 >= 50% ...
    // the success was the 4th request: window now holds 4, 75% failed -> next failure opens
    fail(cb)
    assert(cb.isOpen)
  }

  test("fails fast while open, probes once after the sleep window, closes on success") {
    val (cb, setNow) = mk(volume = 2, pct = 50, sleepMs = 1000L)
    fail(cb); fail(cb)
    assert(cb.isOpen)
    // open: rejected WITHOUT executing
    var executed = false
    intercept[Exception](cb.run { executed = true; 1 })
    assert(!executed && cb.isOpen)
    // after the sleep window: one probe runs and closes the circuit
    setNow(1500L)
    assert(cb.run(7) == 7)
    assert(!cb.isOpen)
    // window was reset: old failures don't linger
    cb.run(8)
    assert(!cb.isOpen)
  }

  test("failed probe re-opens for another sleep window") {
    val (cb, setNow) = mk(volume = 2, pct = 50, sleepMs = 1000L)
    fail(cb); fail(cb)
    assert(cb.isOpen)
    setNow(1200L)
    assert(fail(cb)) // probe executes and fails
    assert(cb.isOpen)
    // still inside the NEW sleep window: fail fast
    setNow(2100L)
    var executed = false
    intercept[Exception](cb.run { executed = true; 1 })
    assert(!executed)
    // after it: probe succeeds, closed again
    setNow(2300L)
    assert(cb.run(9) == 9)
    assert(!cb.isOpen)
  }

  test("slow failures stamp at completion time, preserving the sleep window") {
    val (cb, setNow) = mk(volume = 2, pct = 50, sleepMs = 1000L)
    setNow(5900L)
    assert(fail(cb)) // quick failure at 5900
    // slow failure: enters at 5900, completes at 6800 — the open must
    // be stamped at COMPLETION (6800), not entry, else the sleep
    // window is already half-spent for exactly the slow-sink case
    intercept[RuntimeException](cb.run { setNow(6800L); throw new RuntimeException("slow") })
    assert(cb.isOpen)
    setNow(7500L) // 700 ms after the completion stamp: still open
    var executed = false
    intercept[Exception](cb.run { executed = true; 1 })
    assert(!executed)
    setNow(7900L) // past the window: probe runs and closes
    assert(cb.run(1) == 1)
    assert(!cb.isOpen)
  }

  test("old buckets age out of the rolling window") {
    val (cb, setNow) = mk(volume = 3, pct = 50)
    fail(cb); fail(cb)
    // 1.5 windows later the failures have aged out entirely
    setNow(1500L)
    cb.run(1); cb.run(2)
    fail(cb) // 1 fail / 3 total in window = 33% < 50% -> closed
    assert(!cb.isOpen)
  }
}
